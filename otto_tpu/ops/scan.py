"""Segmented-scan primitives.

Run-length sums over sorted key runs were first implemented as a global
``cumsum`` + subtraction, but a float32 cumsum over millions of elements
accumulates absolute error proportional to the *global* prefix magnitude
(~0.03 at 4e5), corrupting small run totals.  A segmented scan resets at each
run head, so rounding error is confined to the run itself.

The combine op ``(a, fa) ⊕ (b, fb) = (fb ? b : a + b, fa | fb)`` is
associative, which lets ``jax.lax.associative_scan`` parallelize it (log-depth
on the VPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segmented_cumsum(values: jax.Array, head: jax.Array, axis: int = 0) -> jax.Array:
    """Inclusive cumsum along ``axis`` that restarts wherever ``head`` is True.

    values: float array; head: bool array with the same ndim as ``values``
    and broadcast-compatible shape (True marks the first element of each
    segment; head[0] need not be True — the scan starts a segment at position
    0 implicitly).
    """
    assert head.ndim == values.ndim, "head must have same ndim as values"
    flags = jnp.broadcast_to(head, values.shape)

    def combine(left, right):
        a, fa = left
        b, fb = right
        return jnp.where(fb, b, a + b), fa | fb

    out, _ = jax.lax.associative_scan(combine, (values, flags), axis=axis)
    return out


def run_totals(values: jax.Array, head: jax.Array, axis: int = 0) -> jax.Array:
    """Per-position total of the containing run (same value across the run).

    Computes the segmented cumsum, then propagates each run's last value
    backward across the run via a reversed segmented max... implemented as:
    total at run head h = seg_cs at (next_head - 1).
    """
    seg = segmented_cumsum(values, head, axis=axis)
    n = values.shape[axis]
    idx = jnp.arange(n, dtype=jnp.int32)
    shape = [1] * values.ndim
    shape[axis] = n
    idx = idx.reshape(shape)
    flags = jnp.broadcast_to(head, values.shape)
    next_head_idx = jnp.where(flags, jnp.broadcast_to(idx, values.shape), n)
    shifted = jnp.concatenate(
        [
            jax.lax.slice_in_dim(next_head_idx, 1, n, axis=axis),
            jnp.full_like(jax.lax.slice_in_dim(next_head_idx, 0, 1, axis=axis), n),
        ],
        axis=axis,
    )
    next_head = jnp.flip(jax.lax.cummin(jnp.flip(shifted, axis=axis), axis=axis), axis=axis)
    run_last = jnp.clip(next_head - 1, 0, n - 1)
    return jnp.take_along_axis(seg, run_last, axis=axis)
