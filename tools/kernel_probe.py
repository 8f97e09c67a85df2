"""Retrieval-kernel measurement harness (VERDICT round-1 item 5).

Measures, on the real chip, the levers for pushing the production r>=0.99
retrieval path toward speed-of-light:

1. hybrid (f32 PartialReduce + peel) at query-tile sizes 256..2048 — fewer
   table sweeps per batch if the path is bandwidth-limited;
2. the fused bf16 kernel decomposition (stage-1 scan alone vs full search);
3. f32 row-gather cost at several widths (the survivor-rescoring bottleneck);
4. fused bf16 + top-M f32 rescore for M in {100, 192, 256} with measured
   recall vs the exact f32 scan;
5. a hi/lo split-bf16 stage-1 (two planes, f32-exact scores) if implemented.

Prints one JSON line per measurement to the log; run with the chip idle.
"""

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
    from otto_tpu.ops.retrieval import topk_hybrid, topk_scan
    from otto_tpu.ops.pallas_retrieval import PallasRetriever

    items = jax.random.normal(jax.random.PRNGKey(0), (N_ITEMS, DIM), jnp.float32)
    queries = jax.random.normal(jax.random.PRNGKey(1), (B, DIM), jnp.float32)

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    # ground truth for recall (exact scan), once
    s_ex, i_ex = topk_scan(queries, items, k=K, block=32768, metric="euclidean")
    i_ex = np.asarray(i_ex)
    emit(step="exact_done")

    def recall_of(idx):
        idx = np.asarray(idx)
        return float(np.mean([
            len(set(idx[r]) & set(i_ex[r])) / K for r in range(0, B, 7)
        ]))

    # 1. hybrid at several tiles
    for tile in (256, 512, 1024, 2048):
        try:
            @jax.jit
            def step(q, tile=tile):
                s, i = topk_hybrid(q, items, k=K, tile=tile, metric="euclidean")
                return q + 0.0 * s[:, :1], i
            dt = timed_chain(step, queries)
            _, idx = step(queries)
            emit(step="hybrid", tile=tile, qps=round(B / dt, 1), ms=round(dt * 1e3, 2),
                 recall=round(recall_of(idx), 5))
        except Exception as e:
            emit(step="hybrid", tile=tile, error=f"{type(e).__name__}: {e}")

    # 2. fused kernel + decomposition
    retr = PallasRetriever(items, metric="euclidean")
    from otto_tpu.ops.pallas_retrieval import _augment_queries, _stage1

    q_aug, _ = _augment_queries(queries, retr.max_sq, "euclidean")
    q_aug = q_aug.astype(retr.items_aug_t.dtype)

    @jax.jit
    def s1(q):
        out = _stage1(q, retr.items_aug_t, 128, retr.block)
        return q + 0.0 * out[:, :1].astype(q.dtype), out[:, :8]
    dt1 = timed_chain(s1, q_aug)
    emit(step="stage1_only", ms=round(dt1 * 1e3, 2))

    @jax.jit
    def full(q):
        s, i = retr.topk(q, k=K)
        return q + 0.0 * s[:, :1], i
    dtf = timed_chain(full, queries)
    _, idx = full(queries)
    emit(step="fused_bf16", qps=round(B / dtf, 1), ms=round(dtf * 1e3, 2),
         recall=round(recall_of(idx), 5))

    # 3. raw gather cost at several widths
    for M in (100, 256, 684):
        idxr = jax.random.randint(jax.random.PRNGKey(2), (B, M), 0, N_ITEMS)

        @jax.jit
        def g(ix):
            rows = items[ix]  # [B, M, D]
            s = jnp.einsum("bd,bmd->bm", queries, rows)
            return ix, s
        dtg = timed_chain(g, idxr)
        emit(step="gather_rescore", M=M, ms=round(dtg * 1e3, 2))

    # 4. fused + top-M rescore (recall + speed)
    for M in (192, 256, 384):
        @jax.jit
        def fr(q, M=M):
            s, i = retr.topk(q, k=M, exact_scores=True)
            return q + 0.0 * s[:, :1], i[:, :K]
        try:
            dtm = timed_chain(fr, queries)
            _, idx = fr(queries)
            emit(step="fused_topM_rescore", M=M, qps=round(B / dtm, 1),
                 ms=round(dtm * 1e3, 2), recall=round(recall_of(idx), 5))
        except Exception as e:
            emit(step="fused_topM_rescore", M=M, error=f"{type(e).__name__}: {e}")

    # 5. rescore_survivors reference point
    @jax.jit
    def fs(q):
        s, i = retr.topk(q, k=K, rescore_survivors=True)
        return q + 0.0 * s[:, :1], i
    dts = timed_chain(fs, queries, iters=3)
    _, idx = fs(queries)
    emit(step="fused_rescore_survivors", qps=round(B / dts, 1),
         ms=round(dts * 1e3, 2), recall=round(recall_of(idx), 5))
    return 0


if __name__ == "__main__":
    sys.exit(main())
