"""Host-side float64 recency route for the covisitation heuristic.

The device route (:func:`otto_tpu.models.covisitation._recency_route`)
accumulates log-recency weights in float32; at 1M-session scale its
exact-list match vs the float64 reference semantics is ~0.87 on this route
(tie-break drift — PARITY_1M.json), though recall impact measured zero.
This module provides the float64 accumulation option: a fully vectorized
numpy implementation of the recency-weight branch
(src/covisitation/inference.py:143-199) over the raw ragged sessions —
exact reference semantics (full session length, no packing clip, no
unique-list caps, insertion-order ``Counter.most_common`` tie-breaks) at
host speed.

It doubles as the fast CPU-serving path for the recency route: one
lexsort + segmented-reduce over all (session, vote) tuples replaces the
per-chunk XLA dispatch chain, which on a 2-core host pays ~10x over
per-session Python (VERDICT r2 weak #4).
"""

from __future__ import annotations

import numpy as np

from otto_tpu import EVENT_TYPES
from otto_tpu.data.events import EventStore

# reference constants (src/covisitation/inference.py:72,152-171)
EVENT_TYPE_COEFFICIENT = np.array([1.0, 9.0, 6.0])
FT_BONUS = {"clicks": 0.05, "carts": 0.05, "orders": 0.15}
COVISIT_BONUS = {"clicks": 0.05, "carts": 0.05, "orders": 0.15}
LOGSPACE_LO = {"clicks": 0.1, "carts": 0.5, "orders": 0.5}


def _flat_event_indices(offsets: np.ndarray, idx: np.ndarray):
    """Flat event indices + local session ids for the selected sessions."""
    lo = offsets[idx]
    hi = offsets[idx + 1]
    counts = (hi - lo).astype(np.int64)
    total = int(counts.sum())
    starts = np.zeros(len(idx) + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(total, dtype=np.int64) - starts[:-1].repeat(counts)
    ev = lo.repeat(counts) + pos
    sess = np.arange(len(idx), dtype=np.int64).repeat(counts)
    return ev, sess, pos, counts


def _typed_unique(sess: np.ndarray, aid: np.ndarray, keep: np.ndarray):
    """Ascending per-session unique aids of the kept events
    (``np.unique`` semantics of the reference's typed subsets)."""
    s = sess[keep]
    a = aid[keep]
    order = np.lexsort((a, s))
    s, a = s[order], a[order]
    head = np.ones(len(s), bool)
    head[1:] = (s[1:] != s[:-1]) | (a[1:] != a[:-1])
    return s[head], a[head]


def _chain_votes(u_sess: np.ndarray, u_aid: np.ndarray, table: np.ndarray):
    """Flatten ``chain(*[table[a] for a in uniq])`` per session.

    Returns (sess, aid, order) where ``order`` numbers the chained entries
    0.. within each session (insertion sequence for the Counter tie-break).
    """
    rows = table[u_aid]  # [U, K] int32 padded -1
    U, K = rows.shape
    sess = np.repeat(u_sess, K)
    aid = rows.reshape(-1)
    ok = aid >= 0
    sess, aid = sess[ok], aid[ok]
    # insertion order within session: position in the concatenated sequence
    order = np.zeros(len(sess), np.int64)
    if len(sess):
        head = np.ones(len(sess), bool)
        head[1:] = sess[1:] != sess[:-1]
        starts = np.flatnonzero(head)
        order = np.arange(len(sess), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(sess)))
        )
    return sess, aid, order


def _topk_by_weight(sess, aid, w, seq, n_sessions: int, k: int):
    """Group votes by (session, aid): f64 sum + first insertion position,
    then per-session ``Counter.most_common(k)`` ordering."""
    order = np.lexsort((seq, aid, sess))
    s, a, ww, q = sess[order], aid[order], w[order], seq[order]
    head = np.ones(len(s), bool)
    if len(s):
        head[1:] = (s[1:] != s[:-1]) | (a[1:] != a[:-1])
    starts = np.flatnonzero(head)
    totals = np.add.reduceat(ww, starts) if len(starts) else np.zeros(0)
    g_sess, g_aid, g_first = s[starts], a[starts], q[starts]

    rank_order = np.lexsort((g_first, -totals, g_sess))
    rs, ra = g_sess[rank_order], g_aid[rank_order]
    rhead = np.ones(len(rs), bool)
    if len(rs):
        rhead[1:] = rs[1:] != rs[:-1]
    rstarts = np.flatnonzero(rhead)
    within = np.arange(len(rs), dtype=np.int64) - np.repeat(
        rstarts, np.diff(np.append(rstarts, len(rs)))
    )
    out = np.full((n_sessions, k), -1, np.int32)
    keep = within < k
    out[rs[keep], within[keep]] = ra[keep]
    return out


def recency_route_host_f64(
    store: EventStore,
    rec_idx: np.ndarray,
    narrow_tables: dict[str, np.ndarray],
    ft_neighbors: np.ndarray | None = None,
    k: int = 20,
) -> dict[str, np.ndarray]:
    """Float64 recency-weight route over the selected sessions.

    narrow_tables: the top-15 covisitation tables used for the vote bonuses
    (``time_weighted`` for clicks, ``cart_weighted`` for carts,
    ``cart_order`` for orders), int32 [n_aids, 15] padded -1.
    Returns per-type [len(rec_idx), k] int32 prediction matrices.
    """
    rec_idx = np.asarray(rec_idx, dtype=np.int64)
    R = len(rec_idx)
    if R == 0:
        return {t: np.full((0, k), -1, np.int32) for t in EVENT_TYPES}

    ev, sess, pos, counts = _flat_event_indices(store.offsets, rec_idx)
    aid = store.aid[ev].astype(np.int64)
    etype_ev = store.type[ev]
    n = counts[sess].astype(np.float64)
    frac = np.where(n > 1, pos / np.maximum(n - 1.0, 1.0), 0.0)
    coeff = EVENT_TYPE_COEFFICIENT[etype_ev]

    # fastText similar-list votes for the last aid of each session
    ft_sess = ft_aid = ft_order = None
    if ft_neighbors is not None:
        last_aid = store.aid[store.offsets[rec_idx + 1] - 1].astype(np.int64)
        rows = ft_neighbors[last_aid]  # [R, NN]
        NN = rows.shape[1]
        ft_sess = np.repeat(np.arange(R, dtype=np.int64), NN)
        ft_aid = rows.reshape(-1).astype(np.int64)
        ft_order = np.tile(np.arange(NN, dtype=np.int64), R)
        ok = ft_aid >= 0
        ft_sess, ft_aid, ft_order = ft_sess[ok], ft_aid[ok], ft_order[ok]

    # typed unique subsets (ascending — np.unique semantics)
    uniq = {
        "clicks": _typed_unique(sess, aid, etype_ev == 0),
        "carts": _typed_unique(sess, aid, etype_ev <= 1),
        "orders": _typed_unique(sess, aid, etype_ev >= 1),
    }
    bonus_table = {
        "clicks": narrow_tables["time_weighted"],
        "carts": narrow_tables["cart_weighted"],
        "orders": narrow_tables["cart_order"],
    }

    out = {}
    max_events = int(counts.max())
    for t in EVENT_TYPES:
        lo = LOGSPACE_LO[t]
        w_ev = (np.exp2(lo + (1.0 - lo) * frac) - 1.0) * coeff
        parts_s = [sess]
        parts_a = [aid]
        parts_w = [w_ev]
        parts_q = [pos]
        base = max_events  # insertion positions after all events
        if ft_sess is not None:
            parts_s.append(ft_sess)
            parts_a.append(ft_aid)
            parts_w.append(np.full(len(ft_sess), FT_BONUS[t]))
            parts_q.append(base + ft_order)
            base += (ft_neighbors.shape[1] if ft_neighbors is not None else 0)
        u_s, u_a = uniq[t]
        b_s, b_a, b_o = _chain_votes(u_s, u_a, bonus_table[t])
        parts_s.append(b_s)
        parts_a.append(b_a)
        parts_w.append(np.full(len(b_s), COVISIT_BONUS[t]))
        parts_q.append(base + b_o)
        out[t] = _topk_by_weight(
            np.concatenate(parts_s),
            np.concatenate(parts_a),
            np.concatenate(parts_w),
            np.concatenate(parts_q),
            R, k,
        )
    return out
