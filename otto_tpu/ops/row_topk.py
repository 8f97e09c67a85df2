"""Fast approximate row-wise top-k via iterative window peeling (Pallas).

XLA's ``lax.top_k`` on TPU lowers to a full per-row sort — measured ~26 ms
for a [2048, 14528] f32 array on a v5e chip regardless of k, and it is the
dominant cost of every retrieval/aggregation path in this framework (the
``approx_max_k`` aggregation step pays the same sort on its reduced set).

This module replaces it with *peeling*: keep the row in VMEM, and for
``rounds`` iterations pop the maximum of every 128-lane window (one VPU max
tree + one clear pass per round).  After R rounds the collected R*(M/128)
candidates are guaranteed to contain every element that is among the top-R
of its own window; a final exact ``lax.top_k`` over that small candidate set
finishes the job.

Quality bound: a true top-k element is missed only if >= R elements of its
row exceed it *within its own 128-slot window*.  For rows whose large values
are spread roughly uniformly (e.g. window-maxima of a larger scored array),
P(miss) ~ C(k-1, R) * (128/M)^R — at M=14592, k=100, R=6 this is ~7e-4 per
entry.  Exactness can be forced with rounds >= k (every row element pops).

Cost: 2 VPU passes over the row block per round, all VMEM-resident — ~0.2 ms
per round for [2048, 14592] — plus one small exact sort, versus 26 ms for the
XLA sort.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WINDOW = 128


def _peel_kernel(rounds, fill, w, in_ref, vals_ref, cols_ref, scratch):
    rb, m = in_ref.shape
    scratch[:] = in_ref[:]

    def round_body(r, _):
        v = scratch[:].reshape(rb, w, WINDOW)
        mx = jnp.max(v, axis=2)
        eq = v == mx[:, :, None]
        # manual first-match argmax; the lane iota and min-reduce run in f32
        # (Mosaic's argmax is f32-only and its int lane-reductions are ~9x
        # slower than f32 ones), exact for lane values < 2^24
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (rb, w, WINDOW), 2
        ).astype(jnp.float32)  # tpu.iota is int-only; convert for the f32 min
        am = jnp.min(jnp.where(eq, lane, float(WINDOW)), axis=2).astype(jnp.int32)
        base = jax.lax.broadcasted_iota(jnp.int32, (rb, w), 1) * WINDOW
        vals_ref[:, r, :] = mx
        cols_ref[:, r, :] = base + am
        scratch[:] = jnp.where(eq, jnp.asarray(fill, v.dtype), v).reshape(rb, m)
        return 0

    jax.lax.fori_loop(0, rounds, round_body, 0)


@partial(jax.jit, static_argnames=("rounds", "row_block", "interpret"))
def peel_rows(x: jax.Array, rounds: int, row_block: int = 32,
              interpret: bool = False):
    """Pop the per-128-window max of each row, ``rounds`` times.

    x: [B, M] with B % row_block == 0 and M % 128 == 0, any ordered dtype.
    Returns (vals [B, rounds*M/128], cols [B, rounds*M/128] int32) where
    ``cols`` are column indices into x.  Peeled slots are replaced with the
    dtype's minimum, so rows with fewer than ``rounds`` live entries per
    window repeat the fill value (callers treat it as -inf).
    """
    b, m = x.shape
    w = m // WINDOW
    if jnp.issubdtype(x.dtype, jnp.floating):
        fill = float("-inf")
    else:
        fill = int(jnp.iinfo(x.dtype).min)

    vals, cols = pl.pallas_call(
        partial(_peel_kernel, rounds, fill, w),
        grid=(b // row_block,),
        in_specs=[pl.BlockSpec((row_block, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((row_block, rounds, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, rounds, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, rounds, w), x.dtype),
            jax.ShapeDtypeStruct((b, rounds, w), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((row_block, m), x.dtype)],
        interpret=interpret,
    )(x)
    return vals.reshape(b, rounds * w), cols.reshape(b, rounds * w)


def row_topk(x: jax.Array, k: int, rounds: int | None = None,
             row_block: int = 32, interpret: bool = False):
    """Drop-in (approximate) replacement for ``jax.lax.top_k`` over rows.

    Returns (values [B, k], indices [B, k]) sorted descending.  With
    ``rounds >= k`` the result is exact; the default picks
    ``ceil(k * 128 / M) + 4`` rounds (see module docstring for the bound).
    Falls back to ``lax.top_k`` when the row is small or shapes don't tile.
    """
    b, m = x.shape
    w = m // WINDOW if m % WINDOW == 0 else 0
    if rounds is None and w:
        rounds = min(-(-k * WINDOW // m) + 4, k)
    if not w or b % row_block or w * min(rounds, k) < k or m <= 4 * WINDOW:
        return jax.lax.top_k(x, k)
    rounds = min(rounds, k)
    vals, cols = peel_rows(x, rounds, row_block=row_block, interpret=interpret)
    top_v, pos = jax.lax.top_k(vals, k)
    top_c = jnp.take_along_axis(cols, pos, axis=1)
    return top_v, top_c
