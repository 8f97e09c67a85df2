"""Exact top-k retrieval over the item embedding table.

Replaces Annoy (C++ approximate NN over 1.86M x 32 vectors, reference:
src/covisitation/inference.py:58-69, src/ranker/regular_candidate_generation.py:54-70,
src/gensim_fasttext/inference.py:40-65) with an *exact* blocked scan:
at OTTO scale a full matmul sweep of the table is a few MFLOP per query —
trivially MXU-bound — so approximation buys nothing on TPU.

Two implementations:

- :func:`topk_scan` — exact: pure-XLA ``lax.scan`` over item blocks keeping a
  running top-k (never materializes the full [B, N] score matrix).  Correct
  but sort-bound: ~1.2k qps at OTTO scale on a v5e chip.
- :func:`topk_approx` — production path: full-row scoring per query tile
  reduced with the TPU PartialReduce hardware op (``jax.lax.approx_max_k``).
  Measured ~100k qps at OTTO scale — HBM bandwidth-bound (speed of light for
  this op), ~80x the exact scan, with >= ``recall_target`` per-entry recall.

Metrics:
- ``dot``       score = q . x
- ``euclidean`` rank by -(||q - x||^2), computed as 2 q.x - ||x||^2 (+ const
  per query), matching Annoy's euclidean ordering.

Both return (scores [B, k], indices [B, k]) sorted descending by score.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.float32(-3.4e38)


def _pad_items(items: jax.Array, block: int):
    n, d = items.shape
    n_pad = (-n) % block
    if n_pad:
        items = jnp.concatenate([items, jnp.zeros((n_pad, d), items.dtype)], axis=0)
    return items, n


@partial(jax.jit, static_argnames=("k", "block", "metric"))
def topk_scan(queries: jax.Array, items: jax.Array, k: int, block: int = 8192,
              metric: str = "dot"):
    """Blocked running-top-k scan (XLA).

    queries: [B, D] float; items: [N, D] float.
    """
    B, D = queries.shape
    items, n = _pad_items(items, block)
    n_blocks = items.shape[0] // block
    blocks = items.reshape(n_blocks, block, D)

    if metric == "euclidean":
        sq = jnp.sum(items.astype(jnp.float32) ** 2, axis=1).reshape(n_blocks, block)
    else:
        sq = jnp.zeros((n_blocks, block), jnp.float32)

    q = queries.astype(jnp.float32)

    def step(carry, inp):
        top_s, top_i = carry
        blk, blk_sq, blk_idx = inp
        s = jnp.dot(q, blk.T.astype(jnp.float32), preferred_element_type=jnp.float32)
        if metric == "euclidean":
            s = 2.0 * s - blk_sq[None, :]
        idx = blk_idx * block + jnp.arange(block, dtype=jnp.int32)[None, :]
        s = jnp.where(idx < n, s, NEG)
        cat_s = jnp.concatenate([top_s, jnp.broadcast_to(s, (B, block))], axis=1)
        cat_i = jnp.concatenate([top_i, jnp.broadcast_to(idx, (B, block))], axis=1)
        new_s, pos = jax.lax.top_k(cat_s, k)
        new_i = jnp.take_along_axis(cat_i, pos, axis=1)
        return (new_s, new_i), None

    init = (jnp.full((B, k), NEG, jnp.float32), jnp.full((B, k), -1, jnp.int32))
    (top_s, top_i), _ = jax.lax.scan(
        step, init, (blocks, sq, jnp.arange(n_blocks, dtype=jnp.int32)[:, None])
    )
    return top_s, top_i


def build_neighbor_table(
    embeddings: np.ndarray,
    k: int,
    metric: str = "euclidean",
    exclude_self: bool = True,
    query_batch: int = 4096,
    block: int = 16384,
    scores_out: bool = False,
    exact: bool = False,
    backend: str | None = None,
):
    """All-items kNN table: for every aid, its top-k nearest aids.

    Replaces the reference's per-query ``annoy.get_nns_by_item`` with one
    batched sweep; returns int32 [N, k] (+ float32 scores when requested).
    ``exclude_self`` drops the query aid itself from its row (the reference
    skips neighbor 0 — inference.py:167).  ``backend`` (default: "compensated"
    on TPU, "hybrid" elsewhere — the fastest r>=0.99 configuration per
    backend; measured at OTTO scale on a v5e: compensated 288k q/s r=0.991 vs
    hybrid 120k q/s r=0.997): "hybrid" (PartialReduce + pallas peel
    aggregation, f32 scores), "approx" (PartialReduce + XLA aggregation),
    "pallas" (fused
    packed windowed-max kernel over a bf16 table,
    :mod:`otto_tpu.ops.pallas_retrieval`), "compensated" (the fused kernel
    over the hi/lo error-compensated bf16 table — f32-accurate scores at
    bf16 matmul cost, see ``PallasRetriever(precision="compensated")``),
    "int8" (hybrid over a
    per-row-quantized int8 table — 1/4 the table HBM footprint; measured
    r=0.981 and 83k q/s vs the f32 hybrid's r=0.997 / 131k q/s at OTTO
    scale on a v5e, so it is a *memory* option, not a speed one: use it
    when the table must coexist with a large model); ``exact=True``
    overrides with the exact blocked scan.
    """
    if backend is None:
        # the compensated/Pallas default compiles only for Mosaic TPU; any
        # other backend (cpu, gpu, ...) gets the pure-XLA hybrid path
        backend = "compensated" if jax.default_backend() == "tpu" else "hybrid"
    n = embeddings.shape[0]
    fetch = k + 1 if exclude_self else k
    out = np.empty((n, k), np.int32)
    out_s = np.empty((n, k), np.float32) if scores_out else None
    items = jnp.asarray(embeddings)
    retriever = None
    q8table = None
    if backend == "int8" and not exact:
        q8table = quantize_items_int8(items)
    if backend in ("pallas", "compensated") and not exact:
        from otto_tpu.ops.pallas_retrieval import PallasRetriever

        retriever = PallasRetriever(
            items, metric=metric,
            precision="compensated" if backend == "compensated" else "single",
            interpret=jax.default_backend() == "cpu",  # Mosaic needs a TPU
        )
    for start in range(0, n, query_batch):
        end = min(start + query_batch, n)
        q = items[start:end]
        pad = query_batch - (end - start)
        if pad:
            q = jnp.concatenate([q, jnp.zeros((pad, q.shape[1]), q.dtype)], axis=0)
        if exact:
            s, i = topk_scan(q, items, k=fetch, block=block, metric=metric)
        elif retriever is not None:
            s, i = retriever.topk(q, k=fetch)
        elif q8table is not None:
            s, i = topk_hybrid_int8(q, *q8table, k=fetch, metric=metric,
                                    tile=min(256, query_batch))
        elif backend == "hybrid":
            s, i = topk_hybrid(q, items, k=fetch, metric=metric,
                               tile=min(256, query_batch))
        else:
            s, i = topk_approx(q, items, k=fetch, metric=metric,
                               tile=min(256, query_batch))
        s = np.asarray(s[: end - start])
        i = np.asarray(i[: end - start])
        if exclude_self:
            rows = np.arange(start, end)[:, None]
            keep = i != rows
            # at most one self entry per row, so keep has >= k True columns;
            # stable argsort moves them left in original (descending) order
            cols = np.argsort(~keep, axis=1, kind="stable")[:, :k]
            r_idx = np.arange(end - start)[:, None]
            out[start:end] = i[r_idx, cols]
            if scores_out:
                out_s[start:end] = s[r_idx, cols]
        else:
            out[start:end] = i[:, :k]
            if scores_out:
                out_s[start:end] = s[:, :k]
    return (out, out_s) if scores_out else out


@partial(jax.jit, static_argnames=("k", "tile", "metric", "recall_target",
                                   "rounds", "interpret"))
def topk_hybrid(queries: jax.Array, items: jax.Array, k: int, tile: int = 256,
                metric: str = "dot", recall_target: float = 0.99,
                rounds: int = 6, interpret: bool | None = None):
    """PartialReduce + peel selection: full-precision top-k at ~2x topk_approx.

    ``topk_approx``'s cost is dominated not by the matmul or the PartialReduce
    hardware reduction but by its *aggregation*: an exact top-k of the ~5k
    reduced values per query, which XLA lowers to a full row sort (~9 ms at
    [2048, 4950]).  Here the reduction keeps the unsorted window maxima
    (``aggregate_to_topk=False``) and the aggregation runs through the Pallas
    peel kernel (:func:`otto_tpu.ops.row_topk.peel_rows`, ~0.5 ms) + a small
    sort.  Scores stay float32-exact end to end; structural recall is the
    PartialReduce guarantee times the peel tail bound (~(k*128/(l*R))-ish,
    negligible at rounds=12) — measured 0.996 at OTTO scale, k=100.
    """
    from otto_tpu.ops.row_topk import peel_rows

    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # Mosaic needs a TPU
    B, D = queries.shape
    n = items.shape[0]
    pad_q = (-B) % tile
    q = queries
    if pad_q:
        q = jnp.concatenate([q, jnp.zeros((pad_q, D), q.dtype)], axis=0)
    compute_dt = jnp.bfloat16 if items.dtype == jnp.bfloat16 else jnp.float32
    tiles = q.reshape(-1, tile, D).astype(compute_dt)

    if metric == "euclidean":
        sq = jnp.sum(items.astype(jnp.float32) ** 2, axis=1)
    else:
        sq = None

    def one_tile(carry, qt):
        s = jnp.dot(qt, items.T, preferred_element_type=jnp.float32)
        if metric == "euclidean":
            s = 2.0 * s - sq[None, :]
        rs, ri = jax.lax.approx_max_k(s, k, recall_target=recall_target,
                                      aggregate_to_topk=False)
        return carry, (rs, ri.astype(jnp.int32))

    _, (rs, ri) = jax.lax.scan(one_tile, 0, tiles)
    l = rs.shape[-1]
    rs = rs.reshape(-1, l)
    ri = ri.reshape(-1, l)
    b_all = rs.shape[0]

    pad_l = (-l) % 128
    if pad_l:
        rs = jnp.concatenate([rs, jnp.full((b_all, pad_l), NEG, rs.dtype)], axis=1)
    rounds = min(rounds, k)
    # The peel aggregation relies on approx_max_k's TPU PartialReduce layout
    # (window maxima scattered across 128-lane windows).  The CPU fallback
    # returns globally *sorted* values — every top hit in window 0 — which
    # the per-window peel cannot recover; interpret mode takes plain top_k.
    if interpret or rounds * ((l + pad_l) // 128) < k or b_all % 32:
        top_s, pos = jax.lax.top_k(rs, k)  # degenerate shapes: plain sort
    else:
        vals, cols = peel_rows(rs, rounds, row_block=32, interpret=interpret)
        neg_keys, pos_sorted = jax.lax.sort_key_val(-vals, cols, dimension=1)
        top_s = -neg_keys[:, :k]
        pos = pos_sorted[:, :k]
    top_i = jnp.take_along_axis(ri, jnp.minimum(pos, l - 1), axis=1)
    top_i = jnp.where(top_s > NEG / 2, top_i, -1)
    return top_s[:B], top_i[:B]


def quantize_items_int8(items):
    """Per-row symmetric int8 quantization of the item table: returns
    ``(q8 [N, D] int8, scale [N] float32, sq [N] float32)`` with
    ``x[i] ≈ q8[i] * scale[i]`` and ``sq[i] = ||x[i]||^2`` kept exact in
    float32 (for euclidean ranking).  Quarters the table's HBM footprint vs
    float32 (halves vs bfloat16) and moves the scoring matmul onto the MXU's
    int8 path (2x the bf16 MAC rate on v5e)."""
    x = jnp.asarray(items, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-30) / 127.0
    q8 = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
    return q8, scale, jnp.sum(x * x, axis=1)


@partial(jax.jit, static_argnames=("k", "tile", "metric", "recall_target",
                                   "rounds", "interpret"))
def topk_hybrid_int8(queries: jax.Array, q8: jax.Array, scale: jax.Array,
                     sq: jax.Array, k: int, tile: int = 256,
                     metric: str = "dot", recall_target: float = 0.99,
                     rounds: int = 6, interpret: bool | None = None):
    """:func:`topk_hybrid` over an int8-quantized item table (from
    :func:`quantize_items_int8`).  Queries quantize per-row on the fly; the
    int8xint8->int32 tile matmul rescales to float32 as
    ``s = (q8_q . q8_x) * scale_q * scale_x`` (dot) or ``2 s - ||x||^2``
    (euclidean, exact f32 norms).  Ranking error is the product-quantization
    rounding (~1/127 relative per side): measured recall@100 0.981 vs the
    exact f32 scan at OTTO scale (1.86M x 32) — fine where retrieval feeds
    a voting / reranking stage that absorbs tail swaps (every consumer in
    this framework does).  Measured 83k q/s on a v5e vs 131k for the f32
    hybrid: the per-item rescale + bias are full-width [B, N] VPU passes
    that XLA cannot fold into the int8 matmul, so this path trades ~1.6x
    throughput for a 4x smaller table footprint — use when HBM is the
    constraint, not time."""
    from otto_tpu.ops.row_topk import peel_rows

    if interpret is None:
        interpret = jax.default_backend() == "cpu"  # Mosaic needs a TPU
    B, D = queries.shape
    pad_q = (-B) % tile
    q = jnp.asarray(queries, jnp.float32)
    if pad_q:
        q = jnp.concatenate([q, jnp.zeros((pad_q, D), q.dtype)], axis=0)
    qs = jnp.maximum(jnp.max(jnp.abs(q), axis=1), 1e-30) / 127.0
    q8q = jnp.clip(jnp.round(q / qs[:, None]), -127, 127).astype(jnp.int8)
    tiles = q8q.reshape(-1, tile, D)
    tile_qs = qs.reshape(-1, tile)

    def one_tile(carry, inp):
        qt, qst = inp
        s32 = jax.lax.dot_general(
            qt, q8.T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        s = s32.astype(jnp.float32) * (qst[:, None] * scale[None, :])
        if metric == "euclidean":
            s = 2.0 * s - sq[None, :]
        rs, ri = jax.lax.approx_max_k(s, k, recall_target=recall_target,
                                      aggregate_to_topk=False)
        return carry, (rs, ri.astype(jnp.int32))

    _, (rs, ri) = jax.lax.scan(one_tile, 0, (tiles, tile_qs))
    l = rs.shape[-1]
    rs = rs.reshape(-1, l)
    ri = ri.reshape(-1, l)
    b_all = rs.shape[0]
    pad_l = (-l) % 128
    if pad_l:
        rs = jnp.concatenate([rs, jnp.full((b_all, pad_l), NEG, rs.dtype)], axis=1)
    rounds = min(rounds, k)
    # see topk_hybrid: the CPU approx_max_k fallback is sorted, peel is not
    # applicable there
    if interpret or rounds * ((l + pad_l) // 128) < k or b_all % 32:
        top_s, pos = jax.lax.top_k(rs, k)
    else:
        vals, cols = peel_rows(rs, rounds, row_block=32, interpret=interpret)
        neg_keys, pos_sorted = jax.lax.sort_key_val(-vals, cols, dimension=1)
        top_s = -neg_keys[:, :k]
        pos = pos_sorted[:, :k]
    top_i = jnp.take_along_axis(ri, jnp.minimum(pos, l - 1), axis=1)
    top_i = jnp.where(top_s > NEG / 2, top_i, -1)
    return top_s[:B], top_i[:B]


@partial(jax.jit, static_argnames=("k", "tile", "metric", "recall_target"))
def topk_approx(queries: jax.Array, items: jax.Array, k: int, tile: int = 256,
                metric: str = "dot", recall_target: float = 0.99):
    """HBM-speed-of-light top-k via the TPU PartialReduce op.

    Scores each query tile against the *full* item table in one matmul and
    reduces with ``jax.lax.approx_max_k`` — measured ~80x faster than the
    exact blocked scan at OTTO scale (the exact scan's per-block sort costs
    ~100x the matmul; PartialReduce is a dedicated hardware unit).  "Approx"
    means entries can be *missed* with probability ~(1 - recall_target);
    returned scores are exact.  Use :func:`topk_scan` when exactness is
    required.

    queries [B, D] (B padded up to a tile multiple internally), items [N, D].
    Returns (scores [B, k], indices [B, k]) sorted descending.
    """
    B, D = queries.shape
    n = items.shape[0]
    pad_q = (-B) % tile
    q = queries
    if pad_q:
        q = jnp.concatenate([q, jnp.zeros((pad_q, D), q.dtype)], axis=0)
    # bfloat16 item tables halve the HBM table traffic; scores still
    # accumulate in float32 on the MXU
    compute_dt = jnp.bfloat16 if items.dtype == jnp.bfloat16 else jnp.float32
    tiles = q.reshape(-1, tile, D).astype(compute_dt)

    if metric == "euclidean":
        sq = jnp.sum(items.astype(jnp.float32) ** 2, axis=1)
    else:
        sq = None

    def one_tile(carry, qt):
        s = jnp.dot(qt, items.T, preferred_element_type=jnp.float32)
        if metric == "euclidean":
            s = 2.0 * s - sq[None, :]
        bs, bi = jax.lax.approx_max_k(s, k, recall_target=recall_target)
        return carry, (bs, bi.astype(jnp.int32))

    _, (ts, ti) = jax.lax.scan(one_tile, 0, tiles)
    ts = ts.reshape(-1, k)[:B]
    ti = ti.reshape(-1, k)[:B]
    return ts, ti
