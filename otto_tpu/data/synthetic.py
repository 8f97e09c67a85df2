"""Synthetic OTTO-like dataset generator.

The reference repo has no test data (and no tests — SURVEY §4); parity and
benchmarks here run on a synthetic dataset with the same statistical shape as
OTTO: Zipfian aid popularity, geometric-ish session lengths, type mix heavily
click-dominated (~90/9/5), carts/orders echoing recently clicked aids, and a
latent cluster structure so covisitation / embedding models have signal.
"""

from __future__ import annotations

import numpy as np

from otto_tpu.data.events import EventStore


def synthetic_events(
    n_sessions: int = 2_000,
    n_aids: int = 5_000,
    mean_length: float = 12.0,
    max_length: int = 200,
    n_clusters: int = 50,
    start_ts: int = 1_659_304_800,  # aligned with the OTTO test-week epoch scale
    seed: int = 0,
) -> EventStore:
    rng = np.random.default_rng(seed)

    # Zipf-like popularity within clusters; each aid belongs to one cluster.
    aid_cluster = rng.integers(0, n_clusters, size=n_aids)
    # cluster -> member list for fast sampling
    order = np.argsort(aid_cluster, kind="stable")
    sorted_clusters = aid_cluster[order]
    cluster_starts = np.searchsorted(sorted_clusters, np.arange(n_clusters + 1))

    lengths = np.minimum(
        2 + rng.geometric(1.0 / mean_length, size=n_sessions), max_length
    ).astype(np.int64)
    total = int(lengths.sum())

    session = np.repeat(np.arange(n_sessions, dtype=np.int64), lengths)
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate([[0], np.cumsum(lengths)[:-1]]), lengths
    )

    # Cluster random walk: each event stays in the session's current cluster
    # w.p. 0.85, else jumps to a random cluster.
    jump = rng.random(total) < 0.15
    jump |= pos == 0
    cluster_draws = rng.integers(0, n_clusters, size=total)
    session_cluster = np.zeros(total, dtype=np.int64)
    current = cluster_draws.copy()
    current[~jump] = 0
    # forward-fill within sessions: cumulative trick via maximum of indices
    idx_of_jump = np.where(jump, np.arange(total), -1)
    ff = np.maximum.accumulate(idx_of_jump)
    session_cluster = cluster_draws[ff]

    # Draw aids Zipf-like within the chosen cluster.
    csize = cluster_starts[session_cluster + 1] - cluster_starts[session_cluster]
    # zipf rank via u^(3): skews toward low ranks
    ranks = np.floor(rng.random(total) ** 3 * csize).astype(np.int64)
    idx = np.minimum(cluster_starts[session_cluster] + ranks, n_aids - 1)
    aid = order[idx].astype(np.int32)

    # Event types: per-aid conversion propensities (some items convert to
    # carts/orders far more than others) so aid-level ratio features carry
    # real reranking signal, plus a base rate.
    conversion = rng.beta(1.2, 8.0, size=n_aids)  # mean ~0.13, heavy tail
    p_cart = 0.06 + 0.5 * conversion[aid]
    p_order = 0.03 + 0.25 * conversion[aid]
    type_draw = rng.random(total)
    types = np.zeros(total, dtype=np.int8)
    types[type_draw < p_cart + p_order] = 1
    types[type_draw < p_order] = 2
    types[pos == 0] = 0  # sessions start with a click

    # carts/orders re-reference the previous event's aid half the time
    echo = (types > 0) & (rng.random(total) < 0.5) & (pos > 0)
    aid[echo] = aid[np.flatnonzero(echo) - 1]

    # timestamps: session start spread over 4 weeks, gaps 1..600s
    session_start = start_ts + rng.integers(0, 28 * 24 * 3600, size=n_sessions)
    gaps = rng.integers(1, 600, size=total)
    gaps[pos == 0] = 0
    gap_cum = np.cumsum(gaps)
    sess_first = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    ts = np.repeat(session_start, lengths) + (gap_cum - np.repeat(gap_cum[sess_first], lengths))

    return EventStore.from_flat(session, aid, ts, types)
