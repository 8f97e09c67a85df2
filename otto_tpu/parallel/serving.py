"""Multi-chip serving: the candidate generator and the covisitation heuristic
routed through a device mesh.

Sessions shard across the ``data`` axis; the seven covisitation neighbor
tables (and the embedding-kNN table) shard row-wise across the ``model`` axis
— at OTTO scale the wide tables are ~1.86M x 100 int32 ≈ 740 MB each, the
only serving-side state worth sharding.  Per-session voting/top-k kernels run
locally on each data shard; the only collective is the masked-gather ``psum``
that reassembles neighbor rows from the table shards (the same exchange
pattern as :func:`otto_tpu.parallel.sharded_embedding.sharded_lookup`).

The per-session compute is replicated across the ``model`` axis (its cost is
tiny next to the gathers); the table memory is what scales down 1/|model|.

Single-device equivalence is tested on a virtual 8-device mesh in
tests/test_sharded_serving.py; the driver's ``dryrun_multichip`` compiles and
executes the sharded candgen step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from otto_tpu import EVENT_TYPES


def _gather_rows(table_shard: jax.Array, queries: jax.Array, model_axis: str) -> jax.Array:
    """Row gather from a row-sharded int32 neighbor table (-1 padded).

    queries [S, U] (replicated over ``model``); table_shard [rows_per, K].
    Returns [S, U*K] replicated: the owning shard contributes ``row + 1``,
    others 0, so after the psum the -1 sentinel survives for padding queries
    and -1 table slots alike."""
    m = lax.axis_index(model_axis)
    rows_per = table_shard.shape[0]
    li = queries - m * rows_per
    owned = (li >= 0) & (li < rows_per) & (queries >= 0)
    safe = jnp.clip(li, 0, rows_per - 1)
    rows = jnp.where(owned[:, :, None], table_shard[safe] + 1, 0)
    rows = lax.psum(rows, model_axis) - 1
    S, U = queries.shape
    return rows.reshape(S, U * table_shard.shape[1])


def pad_table_rows(table: np.ndarray, parts: int) -> np.ndarray:
    """Pad a [n_aids, K] table to a row multiple of ``parts`` with -1 rows."""
    n = table.shape[0]
    n_pad = (-n) % parts
    if n_pad == 0:
        return table
    return np.concatenate([table, np.full((n_pad, table.shape[1]), -1, table.dtype)])


CANDGEN_TABLE_KINDS = ("time_weighted", "click_weighted", "cart_weighted",
                       "click_cart", "cart_order")


def make_sharded_regular_chunk(
    mesh: Mesh,
    uniq_cap: int,
    wide_k: int,
    k_covisit: int,
    with_ft: bool,
    vote_cap: int = 32,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Sharded twin of ``models.candidates._regular_chunk``: same outputs,
    sessions P(data), tables P(model).  Table args must be pre-sliced to
    ``wide_k`` columns and row-padded to a multiple of the model axis."""
    from otto_tpu.models.candidates import _session_lists, _vote_block

    def local(aids, types, lengths, t_time, t_clickw, t_cartw, t_clickcart,
              t_cartorder, ft):
        S, L = aids.shape
        list_cap = min(uniq_cap, L)
        uniq_recent, clickcart, hist_scores, last_aid = _session_lists(
            aids, types, lengths, list_cap, vote_cap
        )
        vote_src = uniq_recent[:, : min(vote_cap, list_cap)]

        g_time = _gather_rows(t_time, vote_src, model_axis)
        g_clickw = _gather_rows(t_clickw, clickcart, model_axis)
        g_cartw = _gather_rows(t_cartw, clickcart, model_axis)
        g_clickcart = _gather_rows(t_clickcart, clickcart, model_axis)
        g_cartorder = _gather_rows(t_cartorder, clickcart, model_axis)
        if with_ft:
            ft_list = _gather_rows(ft, last_aid, model_axis)
        else:
            ft_list = jnp.full((S, 0), -1, jnp.int32)

        lists = {
            "clicks": jnp.concatenate(
                [g_time, g_clickw, g_cartw, g_clickcart, g_cartorder, ft_list], axis=1
            ),
            "carts": jnp.concatenate([g_time, g_cartw, g_cartorder, ft_list], axis=1),
            "orders": jnp.concatenate([g_time, g_cartw, g_cartorder, ft_list], axis=1),
        }
        pad_cols = uniq_cap - list_cap
        if pad_cols:
            uniq_hist = jnp.pad(uniq_recent, ((0, 0), (0, pad_cols)), constant_values=-1)
            hist = jnp.pad(hist_scores, ((0, 0), (0, pad_cols)))
        else:
            uniq_hist, hist = uniq_recent, hist_scores
        out = {}
        for etype in EVENT_TYPES:
            filt, filt_scores = _vote_block(lists[etype], uniq_recent, k_covisit)
            out[etype] = (
                jnp.concatenate([uniq_hist, filt], axis=1),
                jnp.concatenate([hist, filt_scores], axis=1),
            )
        return out

    table_spec = P(model_axis, None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P(data_axis)) + (table_spec,) * 6,
        out_specs={e: (P(data_axis), P(data_axis)) for e in EVENT_TYPES},
        check_vma=False,  # replicated-over-model outputs via psum
    )
    return jax.jit(fn)


def make_sharded_heuristic_routes(
    mesh: Mesh,
    uniq_cap: int,
    narrow_k: int,
    k: int,
    with_ft: bool,
    data_axis: str = "data",
    model_axis: str = "model",
):
    """Sharded twins of the heuristic's two routes
    (models.covisitation._covisit_route / _recency_route): sessions P(data),
    narrow tables + kNN table P(model), frequency fill rows replicated.
    Returns (covisit_fn, recency_fn)."""
    from otto_tpu.models.covisitation import (
        COVISIT_BONUS,
        FT_BONUS,
        _heur_lists,
        _recency_scored_top,
        _vote_cascade,
    )

    def covisit_local(aids, types, lengths, t_time, t_clickw, t_cartw,
                      t_clickcart, t_cartorder, ft, stats_clicks, stats_carts,
                      stats_orders):
        S = aids.shape[0]
        _, last_aid, uniq_recent, _, clickcart, _ = _heur_lists(
            aids, types, lengths, uniq_cap
        )
        g_time = _gather_rows(t_time, uniq_recent, model_axis)
        g_clickw = _gather_rows(t_clickw, clickcart, model_axis)
        g_cartw = _gather_rows(t_cartw, clickcart, model_axis)
        g_clickcart = _gather_rows(t_clickcart, clickcart, model_axis)
        g_cartorder = _gather_rows(t_cartorder, clickcart, model_axis)
        ft_list = (_gather_rows(ft, last_aid, model_axis) if with_ft
                   else jnp.full((S, 0), -1, jnp.int32))
        lists = {
            "clicks": jnp.concatenate(
                [g_time, g_clickw, g_cartw, g_clickcart, g_cartorder, ft_list], axis=1
            ),
            "carts": jnp.concatenate([g_time, g_cartw, g_cartorder, ft_list], axis=1),
            "orders": jnp.concatenate([g_time, g_cartw, g_cartorder, ft_list], axis=1),
        }
        stats = {"clicks": stats_clicks, "carts": stats_carts, "orders": stats_orders}
        return {
            e: _vote_cascade(lists[e], uniq_recent, stats[e][:k], k)
            for e in EVENT_TYPES
        }

    def recency_local(aids, types, lengths, t_time, t_cartw, t_cartorder, ft):
        S, L = aids.shape
        mask, last_aid, _, click_uniq, clickcart, cartorder = _heur_lists(
            aids, types, lengths, uniq_cap
        )
        ft_list = (_gather_rows(ft, last_aid, model_axis) if with_ft
                   else jnp.full((S, 0), -1, jnp.int32))
        bonus_lists = {
            "clicks": _gather_rows(t_time, click_uniq, model_axis),
            "carts": _gather_rows(t_cartw, clickcart, model_axis),
            "orders": _gather_rows(t_cartorder, cartorder, model_axis),
        }
        lo = {"clicks": 0.1, "carts": 0.5, "orders": 0.5}
        return {
            e: _recency_scored_top(
                aids, types, lengths, mask, ft_list, bonus_lists[e],
                FT_BONUS[e], COVISIT_BONUS[e], lo[e], k,
            )
            for e in EVENT_TYPES
        }

    tspec = P(model_axis, None)
    cov = shard_map(
        covisit_local, mesh=mesh,
        in_specs=(P(data_axis),) * 3 + (tspec,) * 6 + (P(),) * 3,
        out_specs={e: P(data_axis) for e in EVENT_TYPES},
        check_vma=False,
    )
    rec = shard_map(
        recency_local, mesh=mesh,
        in_specs=(P(data_axis),) * 3 + (tspec,) * 4,
        out_specs={e: P(data_axis) for e in EVENT_TYPES},
        check_vma=False,
    )
    return jax.jit(cov), jax.jit(rec)
