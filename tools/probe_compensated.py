"""Measure the compensated hi/lo fused kernel vs the single-bf16 fused kernel
and the hybrid path at OTTO scale on the real chip (VERDICT item 5)."""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

N_ITEMS = int(os.environ.get("PROBE_N_ITEMS", 1_855_604))
DIM = 32
K = 100
B = int(os.environ.get("PROBE_BATCH", 2048))


def timed_chain(fn, x0, iters=8):
    def run(n):
        x = x0
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            x, out = fn(x)
        _ = np.asarray(out)
        return time.perf_counter() - t0

    run(1)
    t1 = run(1)
    tn = run(iters)
    return max((tn - t1) / (iters - 1), 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.jax_cache"))
    from otto_tpu.ops.pallas_retrieval import PallasRetriever
    from otto_tpu.ops.retrieval import topk_hybrid, topk_scan

    items = jax.random.normal(jax.random.PRNGKey(0), (N_ITEMS, DIM), jnp.float32)
    queries = jax.random.normal(jax.random.PRNGKey(1), (B, DIM), jnp.float32)

    print("# exact ground truth...", flush=True)
    t0 = time.time()
    _, exact_i = topk_scan(queries, items, k=K, metric="euclidean")
    exact_sets = [set(map(int, row)) for row in np.asarray(exact_i)]
    print(f"# exact scan {time.time() - t0:.0f}s", flush=True)

    def recall_of(idx):
        idx = np.asarray(idx)
        return sum(len(set(map(int, r)) & e) for r, e in zip(idx, exact_sets)) / (B * K)

    out = []

    def emit(**kw):
        out.append(kw)
        print(json.dumps(kw), flush=True)

    for precision in ("single", "compensated"):
        r = PallasRetriever(items, metric="euclidean", precision=precision)
        for tile in (128, 256, 512):
            def step(q, r=r, tile=tile):
                s, i = r.topk(q, k=K, tile=tile, rounds=6)
                return q, i

            dt = timed_chain(step, queries)
            _, idx = step(queries)
            emit(kernel=f"fused_{precision}", tile=tile,
                 qps=round(B / dt, 0), ms=round(dt * 1e3, 2),
                 recall=round(recall_of(idx), 4))

    def hstep(q):
        s, i = topk_hybrid(q, items, k=K, tile=256, metric="euclidean")
        return q, i

    dt = timed_chain(hstep, queries)
    _, idx = hstep(queries)
    emit(kernel="hybrid_f32", tile=256, qps=round(B / dt, 0),
         ms=round(dt * 1e3, 2), recall=round(recall_of(idx), 4))

    pathlib.Path("/tmp/probe_compensated.json").write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
