"""Fused Pallas retrieval: one-pass packed windowed-max + peeled selection.

Replaces the reference's Annoy approximate-NN index (C++:
src/covisitation/inference.py:58-69, src/ranker/regular_candidate_generation.py:54-70,
src/gensim_fasttext/inference.py:40-65) with the two-stage TPU top-k pattern
(Chern et al., "TPU-KNN: K Nearest Neighbor Search at Peak FLOP/s"), tuned so
every stage is a single cheap pass:

- **Stage 1 (Pallas)** — stream transposed item blocks HBM->VMEM, score them
  against a VMEM-resident query tile on the MXU, and reduce each 128-item
  window to ONE packed int32 on the VPU: the score's float bits (shifted
  positive so integer order == float order) with the low 7 bits replaced by
  the in-window position.  The [B, N] score matrix never exists in HBM.

  Windows are **strided**, not consecutive: within each 16384-item chunk,
  window ``l`` holds the items ``{l, 128+l, ..., 127*128+l}``.  The window
  max is then a max across 128 *same-lane* slices — pure elementwise VPU
  maxima with no cross-lane shuffles.  The consecutive layout's
  ``max(reshape(tq, w, 128), axis=2)`` lowers to a 7-level cross-lane
  shuffle tree that costs 5.4 ms/2048q at OTTO scale; the strided
  elementwise loop costs 1.7 ms (measured on a v5e; stage 1 went
  10.3 -> 5.3 ms against a 3.7 ms matmul-only floor).  Collision
  statistics are identical — items land in windows by table position
  either way.

  Three tricks keep the remaining VPU work to ~2 ops/element:
  * the euclidean bias (-||x||^2), the positivity shift C, and the padding
    mask are all *folded into the matmul* via two augmented dimensions —
    item column [x, -||x||^2, 1] against query row [2q, 1, C] (pad columns
    are all-zero -> score exactly 0, below every real score which is >= 1);
  * C is a power of two, exact in bf16, so the shift cannot perturb order;
  * packing costs one AND + one OR instead of a separate argmax tree.

- **Stage 2 (Pallas)** — :func:`otto_tpu.ops.row_topk.peel_rows` over the
  [B, N/128] packed window maxima: R rounds of pop-the-max-of-each-128-window,
  entirely VMEM-resident (XLA's top_k would full-sort: ~26 ms for this shape).

- **Stage 3 (XLA)** — exact ``top_k`` over the R*(N/16384) surviving
  candidates, decode (column*128 + lane), then rescore the k winners exactly
  against the original table and re-sort, so returned scores are exact and
  the 25-bit packed-order truncation cannot affect the final ordering.

Recall: an entry is missed if another top-k entry shares its 128-item window
(stage 1, ~(k-1)*128/N) or if >= R stronger window-maxima share its stage-2
window (~C(k-1,R)*(128/Nw)^R).  At OTTO scale (N=1.86M, k=100, R=6) the
compound per-entry recall is ~0.992.  Use
:func:`otto_tpu.ops.retrieval.topk_scan` when exactness is required.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from otto_tpu.ops.row_topk import peel_rows

NEG = float(np.float32(-3.0e38))
WINDOW = 128
LANE_MASK = WINDOW - 1  # low 7 bits carry the in-window position
CHUNK = WINDOW * WINDOW  # strided windows live inside 16384-item chunks


def _stage1_kernel(q_ref, it_ref, out_ref):
    """q_ref [TQ, DA] x it_ref [DA, IB] -> packed window maxima [TQ, IB/128].

    Scores are positive by construction (augmented dims), so their float bits
    are order-isomorphic; the low 7 mantissa bits are overwritten with the
    in-window position ``a`` (strided windows: item ``j`` belongs to window
    ``j & 127`` of its 16384-chunk, at position ``a = (j >> 7) & 127``).  The
    bit surgery happens elementwise in int32 but the result is bitcast *back
    to float32 before the reduction* — Mosaic lowers f32 comparisons ~9x
    faster than int32 ones (measured 12 vs 103 ms per full sweep on a v5e
    chip).  The window max runs as an unrolled elementwise-maximum loop over
    the 128 same-lane slices: no cross-lane shuffles (a reshape+axis-reduce
    costs 2x the whole kernel — see module docstring).
    """
    tq = q_ref.shape[0]
    ib = it_ref.shape[1]

    s = jax.lax.dot_general(
        q_ref[:], it_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TQ, IB], all entries >= 1 except pad columns which are exactly 0
    bits = jax.lax.bitcast_convert_type(s, jnp.int32)
    code = (jax.lax.broadcasted_iota(jnp.int32, (tq, ib), 1) >> 7) & LANE_MASK
    packed = jax.lax.bitcast_convert_type((bits & ~LANE_MASK) | code, jnp.float32)
    for mi in range(ib // CHUNK):
        base = mi * CHUNK
        acc = packed[:, base:base + WINDOW]
        for a in range(1, WINDOW):
            acc = jnp.maximum(
                acc, packed[:, base + a * WINDOW:base + (a + 1) * WINDOW])
        out_ref[:, mi * WINDOW:(mi + 1) * WINDOW] = acc


@partial(jax.jit, static_argnames=("tile", "block", "interpret"))
def _stage1(q_aug, items_aug_t, tile, block, interpret=False):
    b, da = q_aug.shape
    n_pad = items_aug_t.shape[1]
    nw = n_pad // WINDOW
    # grid order (item block, query tile): the inner loop cycles query tiles,
    # so the 127MB table streams through VMEM ONCE instead of once per tile
    return pl.pallas_call(
        _stage1_kernel,
        grid=(n_pad // block, b // tile),
        in_specs=[
            pl.BlockSpec((tile, da), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((da, block), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, block // WINDOW), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nw), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * da,
            bytes_accessed=n_pad * da * items_aug_t.dtype.itemsize
            + (n_pad // block) * b * da * q_aug.dtype.itemsize + b * nw * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_aug, items_aug_t)


class PallasRetriever:
    """Prepared item table + fused top-k search.

    ``items`` [N, D] float.  ``metric``: "dot" (score q.x) or "euclidean"
    (Annoy euclidean order: score 2 q.x - ||x||^2).  The table is stored
    transposed in ``table_dtype`` (default bfloat16 — halves HBM traffic;
    final scores are rescored exactly from the same table dtype).

    ``precision="compensated"`` stores an error-compensated bf16 split of the
    augmented table: item columns ``[hi(x); lo(x); hi(x)]`` scored against
    query rows ``[qhi, qhi, qlo]``, so the matmul accumulates
    ``qhi·hi + qhi·lo + qlo·hi ≈ q·x`` to ~2^-17 relative error — f32-accurate
    scores from pure-bf16 MXU inputs.  The contraction dim grows from D+2 to
    3(D+2) (102 for D=32), which is *free on the MXU*: the systolic array
    processes K=128 per pass regardless, and the measured stage-1 matmul floor
    at K=34 already equals the K=128 cost.  This removes the bf16 scoring
    error of the default table (recall-vs-exact limited only by stage-1/2
    window elimination) without the 6x-cost survivor re-gather.
    """

    def __init__(self, items, metric: str = "dot", block: int = 16384,
                 table_dtype=jnp.bfloat16, rescore_dtype=jnp.float32,
                 precision: str = "single", interpret: bool = False):
        if block % (WINDOW * WINDOW):
            raise ValueError("block must be a multiple of 128*128")
        if precision not in ("single", "compensated"):
            raise ValueError(f"unknown precision {precision!r}")
        items = jnp.asarray(items)
        self.n_items, self.dim = items.shape
        self.metric = metric
        self.block = block
        self.precision = precision
        self.interpret = interpret
        n_pad = (-self.n_items) % block

        itf = items.astype(jnp.float32)
        sq = jnp.sum(itf * itf, axis=1)
        self.max_sq = float(jnp.max(sq))
        # [N, D] kept for rescoring (f32 by default: survivor rescoring then
        # removes the bf16 scoring error of the fused kernel; costs N*D*4
        # bytes of HBM on top of the bf16 compute table)
        self.items = items.astype(rescore_dtype)
        self.sq = sq  # [N] float32
        # augmented transposed table [D+2, N_pad]: rows [x; -||x||^2; 1]
        aug = jnp.concatenate(
            [itf, -sq[:, None], jnp.ones((self.n_items, 1), jnp.float32)], axis=1
        )
        if precision == "compensated":
            if table_dtype != jnp.bfloat16:
                raise ValueError(
                    "precision='compensated' hardcodes a bf16 hi/lo split; "
                    f"table_dtype={table_dtype} is ignored — pass the default "
                    "bf16 or use precision='single'"
                )
            hi = aug.astype(jnp.bfloat16)
            lo = (aug - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            aug_cat = jnp.concatenate([hi, lo, hi], axis=1)  # [N, 3(D+2)] bf16
            self.items_aug_t = jnp.pad(aug_cat.T, ((0, 0), (0, n_pad)))
        else:
            self.items_aug_t = jnp.pad(
                aug.astype(table_dtype).T, ((0, 0), (0, n_pad))
            )

    def topk(self, queries, k: int, tile: int = 128, rounds: int = 6,
             exact_scores: bool = False, rescore_survivors: bool = False):
        """queries [B, D] -> (scores [B, k], indices [B, k]), descending.

        Scores decode from the packed keys (relative error <= 2^-17 of the
        shifted score — the 7 lane bits); ``exact_scores=True`` re-gathers the
        winning items and rescores them exactly (costs a [B, k, D] gather).
        ``rescore_survivors=True`` instead rescores ALL stage-2 survivors
        (rounds * N/16384 per row) in ``rescore_dtype`` before the final
        top-k: the bf16 kernel then only *selects* the survivor pool, and the
        k winners are chosen by exact f32 scores — removing the bf16 scoring
        error everywhere except stage-1 window-max elimination.  Measured at
        OTTO scale: recall-vs-f32 0.9875 → 0.9911, but the [B, 684]-row f32
        re-gather costs ~6x the whole bf16 scan (26k vs 181k q/s) — when
        r >= 0.99 is required, use :func:`otto_tpu.ops.retrieval.topk_hybrid`
        (155k q/s at r = 0.997) instead.

        The whole search is ONE jitted program with the tables passed as
        arguments — callers must NOT wrap it in an outer ``jax.jit`` whose
        closure captures the retriever (closure-captured tables lower as
        program constants: hundreds of MB in the compile payload).
        """
        queries = jnp.asarray(queries)
        n_pad = self.items_aug_t.shape[1]
        n_cands = rounds * (n_pad // (WINDOW * WINDOW))
        if k > n_cands or n_pad <= 4 * self.block:
            return _dense_topk(self.items, self.sq, queries, metric=self.metric,
                               k=min(k, self.n_items))
        return _topk_impl(
            self.items_aug_t, self.items, self.sq, queries,
            metric=self.metric, n_items=self.n_items, max_sq=self.max_sq,
            block=self.block, tile=tile, rounds=rounds, k=k,
            exact_scores=exact_scores, rescore_survivors=rescore_survivors,
            precision=self.precision, interpret=self.interpret,
        )


def _decode_index(col, pos):
    """Strided-window decode: global window column ``col`` = chunk*128 + lane,
    packed low bits ``pos`` = position within the window -> item index
    ``chunk*16384 + pos*128 + lane``."""
    return (col >> 7) * CHUNK + pos * WINDOW + (col & LANE_MASK)


def _augment_queries(q, max_sq: float, metric: str):
    """[B, D] -> [B, D+2] = [aq, u, C]; C a power of two making every
    real score positive (>= 1) in both metrics."""
    qf = q.astype(jnp.float32)
    qsq_max = jnp.max(jnp.sum(qf * qf, axis=1))
    bound = 2.0 + qsq_max + 2.0 * max_sq
    c = jnp.exp2(jnp.ceil(jnp.log2(bound)))  # bf16-exact shift
    # score = a*(q.x) - u*||x||^2 + c against item column [x, -||x||^2, 1]
    a, u = (2.0, 1.0) if metric == "euclidean" else (1.0, 0.0)
    b = q.shape[0]
    return jnp.concatenate(
        [a * qf, jnp.full((b, 1), u, jnp.float32),
         jnp.broadcast_to(c, (b, 1))], axis=1
    ), c


def _rescore(items, sq, q, idx, metric: str):
    """Scores of items ``idx`` [B, k] under the metric, f32 math."""
    gathered = items[idx].astype(jnp.float32)  # [B, k, D]
    s = jnp.einsum("bd,bkd->bk", q.astype(jnp.float32), gathered)
    if metric == "euclidean":
        s = 2.0 * s - sq[idx]
    return s


@partial(jax.jit, static_argnames=(
    "metric", "n_items", "max_sq", "block", "tile", "rounds", "k",
    "exact_scores", "rescore_survivors", "precision", "interpret"))
def _topk_impl(items_aug_t, items, sq, queries, *, metric, n_items, max_sq,
               block, tile, rounds, k, exact_scores, rescore_survivors,
               precision="single", interpret=False):
    b, d = queries.shape
    pad_q = (-b) % tile
    q_aug, c_shift = _augment_queries(queries, max_sq, metric)
    if precision == "compensated":
        qhi = q_aug.astype(jnp.bfloat16)
        qlo = (q_aug - qhi.astype(jnp.float32)).astype(jnp.bfloat16)
        # [qhi, qhi, qlo] against item rows [hi; lo; hi]: the C and u
        # augmented entries are bf16-exact, so their lo parts are 0 and the
        # shift/bias accumulate exactly once
        q_aug = jnp.concatenate([qhi, qhi, qlo], axis=1)
    else:
        q_aug = q_aug.astype(items_aug_t.dtype)
    if pad_q:
        q_aug = jnp.concatenate(
            [q_aug, jnp.zeros((pad_q, q_aug.shape[1]), q_aug.dtype)], axis=0
        )

    packed = _stage1(q_aug, items_aug_t, tile, block, interpret=interpret)
    row_block = min(32, packed.shape[0])
    vals, cols = peel_rows(packed, rounds, row_block=row_block,
                           interpret=interpret)
    if rescore_survivors:
        bits_all = jax.lax.bitcast_convert_type(vals[:b], jnp.int32)
        idx_all = jnp.minimum(_decode_index(cols[:b], bits_all & LANE_MASK),
                              n_items - 1)
        live_all = bits_all >= 0x3F800000  # real scores are >= 1.0
        s_all = jnp.where(live_all, _rescore(items, sq, queries, idx_all, metric), NEG)
        neg_s, idx_sorted = jax.lax.sort_key_val(-s_all, idx_all, dimension=1)
        return -neg_s[:, :k], idx_sorted[:, :k]
    # sort_key_val beats top_k+gather here (0.7 vs 2.3 ms at [2048, 684])
    neg_keys, col = jax.lax.sort_key_val(-vals, cols, dimension=1)
    top_v = -neg_keys[:b, :k]
    col = col[:b, :k]                                   # window index
    bits = jax.lax.bitcast_convert_type(top_v, jnp.int32)
    lane = bits & LANE_MASK
    idx = jnp.minimum(_decode_index(col, lane), n_items - 1)
    # pad windows pack to bits in [0, 128); every real score is >= 1.0
    # whose bits are 0x3F800000 — rank pads out
    live = bits >= 0x3F800000

    if exact_scores:
        s = _rescore(items, sq, queries, idx, metric)
        s = jnp.where(live, s, NEG)
        s_sorted, order = jax.lax.top_k(s, k)
        return s_sorted, jnp.take_along_axis(idx, order, axis=1)
    s = jax.lax.bitcast_convert_type(bits & ~LANE_MASK, jnp.float32) - c_shift
    return jnp.where(live, s, NEG), idx


@partial(jax.jit, static_argnames=("metric", "k"))
def _dense_topk(items, sq, queries, *, metric, k):
    """Exact path for tables too small for the tiled kernel."""
    s = queries.astype(jnp.float32) @ items.astype(jnp.float32).T
    if metric == "euclidean":
        s = 2.0 * s - sq[None, :]
    return jax.lax.top_k(s, k)
