"""Fused Pallas retrieval kernel: blocked matmul + per-window argmax.

Replaces the reference's Annoy approximate-NN index (C++:
src/covisitation/inference.py:58-69, src/ranker/regular_candidate_generation.py:54-70,
src/gensim_fasttext/inference.py:40-65) with the two-stage TPU top-k pattern
(Chern et al., "TPU-KNN: K Nearest Neighbor Search at Peak FLOP/s"):

- **Stage 1 (Pallas kernel)** — stream item blocks HBM->VMEM, score them
  against a VMEM-resident query tile on the MXU, and reduce each run of 128
  consecutive items to its (max score, argmax index) on the VPU *inside the
  kernel*.  The [B, N] score matrix is never materialized in HBM — per item
  sweep the kernel writes only [B, N/128] window maxima, a 128x reduction in
  HBM store traffic versus the unfused ``matmul -> approx_max_k`` program,
  whose score materialization dominates its runtime.
- **Stage 2 (XLA)** — exact ``lax.top_k`` over the N/128 window maxima per
  query, then a gather of the stage-1 argmax indices.

Returned scores are exact dot / euclidean-order values of the returned items.
Like the TPU PartialReduce op, the windowed-max structure can *miss* an entry
when two of the true top-k fall in the same 128-item window: per-entry recall
is ~``1 - (k-1)/(N/128)`` (>= 0.993 at OTTO scale for k=100).  Use
:func:`otto_tpu.ops.retrieval.topk_scan` when exactness is required.

The item table is held transposed ``[D, N]`` (items along lanes) and in
bfloat16, halving HBM table traffic; accumulation is float32 on the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = float(np.float32(-3.0e38))
WINDOW = 128  # items per reduction window (one VPU lane row)


def _stage1_kernel(n_items, metric, with_argmax, q_ref, it_ref, sq_ref, ws_ref, wi_ref):
    """One (query-tile, item-block) grid cell.

    q_ref  [TQ, D]   — query tile, resident across the item sweep
    it_ref [D, IB]   — transposed item block
    sq_ref [1, IB]   — per-item squared norms (euclidean only)
    ws_ref [TQ, IB/WINDOW] — window max scores
    wi_ref [TQ, IB/WINDOW] — global item index of each window max
    """
    j = pl.program_id(1)
    tq, d = q_ref.shape
    ib = it_ref.shape[1]
    w = ib // WINDOW

    s = jax.lax.dot_general(
        q_ref[:], it_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, IB]
    if metric == "euclidean":
        s = 2.0 * s - sq_ref[0, :][None, :]

    # mask table padding (the tail block may run past n_items)
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, ib), 1)
    gidx = j * ib + col
    s = jnp.where(gidx < n_items, s, NEG)

    s3 = s.reshape(tq, w, WINDOW)
    wmax = jnp.max(s3, axis=2)
    base = j * ib + jax.lax.broadcasted_iota(jnp.int32, (tq, w), 1) * WINDOW
    if with_argmax:
        warg = jnp.argmax(s3, axis=2).astype(jnp.int32)
        wi_ref[:] = base + warg
    else:  # benchmark probe: skip the argmax reduction
        wi_ref[:] = base
    ws_ref[:] = wmax


@partial(jax.jit,
         static_argnames=("k", "tile", "block", "metric", "n_items", "interpret",
                          "stage2"))
def _topk_windowed(queries, items_t, sq, k, tile, block, metric, n_items,
                   interpret=False, stage2="exact"):
    b, d = queries.shape
    n_pad = items_t.shape[1]
    n_blocks = n_pad // block
    n_tiles = b // tile
    nw = n_pad // WINDOW

    ws, wi = pl.pallas_call(
        partial(_stage1_kernel, n_items, metric, stage2 != "stage1_noarg"),
        grid=(n_tiles, n_blocks),
        in_specs=[
            pl.BlockSpec((tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, block // WINDOW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, block // WINDOW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nw), jnp.float32),
            jax.ShapeDtypeStruct((b, nw), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * d,
            bytes_accessed=n_tiles * n_pad * d * items_t.dtype.itemsize
            + b * d * queries.dtype.itemsize + 2 * b * nw * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, items_t, sq)

    if stage2 in ("stage1_only", "stage1_noarg"):  # benchmark probes
        return ws, wi
    if stage2 == "approx":
        top_s, pos = jax.lax.approx_max_k(ws, k, recall_target=0.99)
        pos = pos.astype(jnp.int32)
    else:
        top_s, pos = jax.lax.top_k(ws, k)
    top_i = jnp.take_along_axis(wi, pos, axis=1)
    return top_s, top_i


class PallasRetriever:
    """Prepared item table + fused top-k search.

    ``items`` [N, D] float; stored transposed bf16 (f32 accumulation).
    ``metric``: "dot" or "euclidean" (Annoy-order: rank by 2 q.x - ||x||^2).
    """

    def __init__(self, items, metric: str = "dot", block: int = 16384,
                 table_dtype=jnp.bfloat16, interpret: bool = False):
        self.interpret = interpret
        items = jnp.asarray(items)
        self.n_items, self.dim = items.shape
        self.metric = metric
        self.block = block
        n_pad = (-self.n_items) % block
        itf = items.astype(jnp.float32)
        self.sq = jnp.pad(jnp.sum(itf * itf, axis=1), (0, n_pad))[None, :]
        if metric != "euclidean":
            self.sq = jnp.zeros_like(self.sq)
        self.items_t = jnp.pad(
            items.astype(table_dtype).T, ((0, 0), (0, n_pad))
        )

    def topk(self, queries, k: int, tile: int = 128, stage2: str = "exact"):
        """queries [B, D] -> (scores [B, k], indices [B, k]), descending."""
        b, d = queries.shape
        if k > self.items_t.shape[1] // WINDOW:
            # fewer windows than k: the table is tiny — dense exact path
            s = jnp.asarray(queries).astype(jnp.float32) @ self.items_t.astype(jnp.float32)
            if self.metric == "euclidean":
                s = 2.0 * s - self.sq[0][None, :]
            col = jnp.arange(self.items_t.shape[1])
            s = jnp.where(col[None, :] < self.n_items, s, NEG)
            return jax.lax.top_k(s, k)
        pad_q = (-b) % tile
        q = jnp.asarray(queries).astype(self.items_t.dtype)
        if pad_q:
            q = jnp.concatenate([q, jnp.zeros((pad_q, d), q.dtype)], axis=0)
        s, i = _topk_windowed(q, self.items_t, self.sq, k, tile, self.block,
                              self.metric, self.n_items,
                              interpret=self.interpret, stage2=stage2)
        return s[:b], i[:b]
