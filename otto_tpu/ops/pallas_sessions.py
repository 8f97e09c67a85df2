"""Pallas TPU kernel for the per-session aid-vote aggregation.

The XLA path in :mod:`otto_tpu.ops.sessions` materializes the pairwise
equality tensor ``eq [S, L, L]`` in HBM before reducing it (the einsum
operand can't fuse into the compare).  This kernel tiles sessions into VMEM
and computes, per session row:

- ``agg[i]   = sum_j weights[j] * (aids[i] == aids[j])``  (the Counter sum)
- ``first[i] = no j < i with aids[j] == aids[i]``          (first occurrence)
- ``firstpos[i] = min j with aids[j] == aids[i]``          (stable tie-break)

entirely on-chip — the [L, L] intermediate never leaves VMEM.  The top-k
ranking stays in XLA (``lax.top_k`` over [S, L] is cheap).

Padding positions must arrive with ``aids == -1`` (compare-false against
everything real); their outputs are zeros/garbage and are masked by the
caller.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vote_kernel(aids_ref, w_ref, agg_ref, first_ref, firstpos_ref):
    Bs, L = aids_ref.shape

    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), dimension=1)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), dimension=0)
    lower = col < row  # strictly-earlier positions

    def body(b, _):
        # dynamic row loads/stores go through the refs (Mosaic supports
        # dynamic ref indexing, not dynamic_slice of loaded values)
        ab = aids_ref[pl.ds(b, 1), :]  # [1, L]
        wb = w_ref[pl.ds(b, 1), :]  # [1, L]
        a_col = jnp.broadcast_to(ab.reshape(L, 1), (L, L))  # aids[i] down rows
        a_row = jnp.broadcast_to(ab, (L, L))  # aids[j] across cols
        eq = (a_col == a_row) & (a_col >= 0)  # [L, L]
        agg_ref[pl.ds(b, 1), :] = jnp.sum(
            jnp.where(eq, jnp.broadcast_to(wb, (L, L)), 0.0), axis=1
        ).reshape(1, L)
        dup = jnp.any(eq & lower, axis=1)
        first_ref[pl.ds(b, 1), :] = (
            (~dup) & (ab.reshape(L) >= 0)
        ).astype(jnp.int32).reshape(1, L)
        firstpos_ref[pl.ds(b, 1), :] = jnp.min(
            jnp.where(eq, col, jnp.int32(L)), axis=1
        ).reshape(1, L)
        return 0

    jax.lax.fori_loop(0, Bs, body, 0)


@partial(jax.jit, static_argnames=("session_tile", "interpret"))
def aid_vote_aggregate(
    aids: jax.Array,  # int32 [S, L], padding = -1
    weights: jax.Array,  # f32 [S, L]
    session_tile: int = 8,
    interpret: bool = False,
):
    """Fused per-session vote aggregation.

    Returns (agg f32 [S, L], first int32 [S, L], firstpos int32 [S, L]).
    """
    S, L = aids.shape
    pad = (-S) % session_tile
    if pad:
        aids = jnp.concatenate([aids, jnp.full((pad, L), -1, aids.dtype)])
        weights = jnp.concatenate([weights, jnp.zeros((pad, L), weights.dtype)])
    Sp = aids.shape[0]
    grid = (Sp // session_tile,)

    agg, first, firstpos = pl.pallas_call(
        _vote_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((session_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((session_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((session_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((session_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((session_tile, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, L), jnp.float32),
            jax.ShapeDtypeStruct((Sp, L), jnp.int32),
            jax.ShapeDtypeStruct((Sp, L), jnp.int32),
        ],
        interpret=interpret,
    )(aids, weights)
    return agg[:S], first[:S], firstpos[:S]


@partial(jax.jit, static_argnames=("k", "session_tile", "interpret"))
def per_aid_weight_top_pallas(
    aids: jax.Array,  # int32 [S, L]
    weights: jax.Array,  # f32 [S, L]
    mask: jax.Array,  # bool [S, L]
    k: int = 20,
    session_tile: int = 8,
    interpret: bool = False,
):
    """Drop-in equivalent of :func:`otto_tpu.ops.sessions.per_aid_weight_top`
    with the aggregation fused in VMEM."""
    NEG = jnp.float32(-3.4e38)
    masked_aids = jnp.where(mask, aids, -1)
    masked_w = jnp.where(mask, weights, 0.0)
    agg, first, firstpos = aid_vote_aggregate(
        masked_aids, masked_w, session_tile=session_tile, interpret=interpret
    )
    score = jnp.where(first > 0, agg, NEG)
    order = jnp.lexsort((firstpos.astype(jnp.float32), -score), axis=-1)
    top = order[:, :k]
    picked = jnp.take_along_axis(masked_aids, top, axis=1)
    picked_score = jnp.take_along_axis(score, top, axis=1)
    picked = jnp.where(picked_score > NEG / 2, picked, -1)
    return picked.astype(jnp.int32), jnp.where(picked >= 0, picked_score, 0.0)
