"""Benchmark: exact kNN retrieval over the full OTTO-scale item table plus
ranker-tower candidate scoring, on whatever accelerator JAX provides.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The primary metric is retrieval queries/sec over a 1,855,604 x 32 embedding
table (the workload that replaces the reference's Annoy index; Annoy on CPU
serves ~1e4-1e5 approximate queries/sec — here the scan is *exact*).
``vs_baseline`` compares against a numpy (BLAS) implementation of the same
exact top-k measured in-process on a reduced slice and scaled by FLOPs.
"""

import json
import os
import sys
import time

import numpy as np

N_ITEMS = int(os.environ.get("BENCH_N_ITEMS", 1_855_604))
DIM = 32
K = 100
QUERY_BATCH = int(os.environ.get("BENCH_QUERY_BATCH", 2048))
BLOCK = int(os.environ.get("BENCH_BLOCK", 32768))
TOWER_BATCH = 1024
TOWER_C = 128
TOWER_F = 52


def main():
    import jax
    import jax.numpy as jnp

    from otto_tpu.models.ranker import init_tower, tower_forward
    from otto_tpu.ops.retrieval import topk_scan

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]

    # ---------------- retrieval benchmark --------------------------------
    # generate on device: host->device transfer may cross a slow tunnel
    items = jax.random.normal(jax.random.PRNGKey(0), (N_ITEMS, DIM), jnp.float32)
    queries = jax.random.normal(jax.random.PRNGKey(1), (QUERY_BATCH, DIM), jnp.float32)
    jax.block_until_ready((items, queries))

    fn = lambda q: topk_scan(q, items, k=K, block=BLOCK, metric="euclidean")
    s, i = fn(queries)  # compile + warm
    jax.block_until_ready((s, i))
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        s, i = fn(queries)
    jax.block_until_ready((s, i))
    dt = (time.perf_counter() - t0) / iters
    qps = QUERY_BATCH / dt

    # numpy baseline on a reduced table, scaled by item count (work is linear
    # in N): exact same algorithm (full scores + argpartition top-k)
    n_small = min(131_072, N_ITEMS)
    items_np = rng.normal(size=(n_small, DIM)).astype(np.float32)
    q_np = rng.normal(size=(256, DIM)).astype(np.float32)
    sq = np.sum(items_np**2, axis=1)
    t0 = time.perf_counter()
    scores = 2.0 * q_np @ items_np.T - sq[None, :]
    part = np.argpartition(-scores, K, axis=1)[:, :K]
    np.take_along_axis(scores, part, axis=1)
    cpu_dt = time.perf_counter() - t0
    cpu_qps = 256 / (cpu_dt * (N_ITEMS / n_small))

    # ---------------- tower scoring benchmark ----------------------------
    params = init_tower(jax.random.PRNGKey(0), TOWER_F, (256, 256, 128))
    feats = jnp.asarray(rng.normal(size=(TOWER_BATCH, TOWER_C, TOWER_F)).astype(np.float32))
    tf = jax.jit(lambda p, x: tower_forward(p, x))
    jax.block_until_ready(tf(params, feats))
    t0 = time.perf_counter()
    for _ in range(10):
        out = tf(params, feats)
    jax.block_until_ready(out)
    tower_dt = (time.perf_counter() - t0) / 10
    cands_per_sec = TOWER_BATCH * TOWER_C / tower_dt

    print(
        json.dumps(
            {
                "metric": "exact_knn_qps_1.86M_items",
                "value": round(qps, 1),
                "unit": "queries/s",
                "vs_baseline": round(qps / cpu_qps, 2),
                "device": str(dev),
                "knn_k": K,
                "cpu_exact_qps_est": round(cpu_qps, 1),
                "ranker_candidates_scored_per_s": round(cands_per_sec, 1),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
