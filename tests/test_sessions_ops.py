"""Session-kernel tests against Python oracles restating the reference's
per-session dict/Counter semantics."""

from collections import Counter, defaultdict

import numpy as np
import pytest

from otto_tpu.data.synthetic import synthetic_events
from otto_tpu.ops.sessions import (
    distinct_first_seen,
    distinct_recent_first,
    first_occurrence,
    last_occurrence,
    per_aid_weight_top,
    recency_weighted_top_aids,
)


def make_packed(sessions):
    """sessions: list of (aids, types) tuples -> packed arrays (keep full)."""
    L = max(len(a) for a, _ in sessions)
    S = len(sessions)
    aids = np.zeros((S, L), np.int32)
    types = np.zeros((S, L), np.int8)
    mask = np.zeros((S, L), bool)
    lengths = np.zeros(S, np.int32)
    for i, (a, t) in enumerate(sessions):
        aids[i, : len(a)] = a
        types[i, : len(a)] = t
        mask[i, : len(a)] = True
        lengths[i] = len(a)
    return aids, types, mask, lengths


def test_first_last_occurrence():
    aids, types, mask, _ = make_packed([([3, 5, 3, 7, 5], [0] * 5)])
    first = np.asarray(first_occurrence(aids, mask))[0]
    last = np.asarray(last_occurrence(aids, mask))[0]
    assert list(first) == [True, True, False, True, False]
    assert list(last) == [False, False, True, True, True]


def test_distinct_recent_first_matches_dict_fromkeys():
    rng = np.random.default_rng(0)
    sessions = [
        (rng.integers(0, 8, rng.integers(1, 12)).tolist(), [0] * 12) for _ in range(50)
    ]
    sessions = [(a, t[: len(a)]) for a, t in sessions]
    aids, types, mask, lengths = make_packed(sessions)
    got = np.asarray(distinct_recent_first(aids, mask, k=20))
    for i, (a, _) in enumerate(sessions):
        expected = list(dict.fromkeys(a[::-1]))[:20]
        row = [x for x in got[i] if x >= 0]
        assert row == expected, (a, row, expected)


def test_distinct_first_seen_matches_counter_keys():
    rng = np.random.default_rng(1)
    sessions = [
        (rng.integers(0, 6, rng.integers(1, 15)).tolist(), None) for _ in range(50)
    ]
    sessions = [(a, [0] * len(a)) for a, _ in sessions]
    aids, types, mask, lengths = make_packed(sessions)
    got = np.asarray(distinct_first_seen(aids, mask, k=3))
    for i, (a, _) in enumerate(sessions):
        expected = list(Counter(a).keys())[:3]
        row = [x for x in got[i] if x >= 0]
        assert row == expected


def oracle_aid_weight(aids, types, coeffs, k=20):
    """Reference aid-weight scoring (src/baseline/aid_weight.py:40-46)."""
    weights = np.logspace(0.1, 1, len(aids), base=2, endpoint=True) - 1
    w = defaultdict(float)
    for a, t, wt in zip(aids, types, weights):
        w[a] += wt * coeffs[t]
    return [a for a, _ in sorted(w.items(), key=lambda kv: -kv[1])][:k]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_recency_weighted_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    sessions = []
    for _ in range(60):
        n = int(rng.integers(1, 25))
        sessions.append(
            (rng.integers(0, 10, n).tolist(), rng.integers(0, 3, n).tolist())
        )
    aids, types, mask, lengths = make_packed(sessions)
    coeffs = (1.0, 6.0, 3.0)
    got, got_w = recency_weighted_top_aids(
        aids, types, mask, lengths, np.asarray(coeffs, np.float32), k=20
    )
    got = np.asarray(got)
    for i, (a, t) in enumerate(sessions):
        expected = oracle_aid_weight(a, t, coeffs)
        row = [x for x in got[i] if x >= 0]
        assert row == expected, (a, t, row, expected)


def test_recency_weighted_clipped_tail():
    """With keep='last' clipping, true positions (and thus weights) must use
    the full session length."""
    es = synthetic_events(n_sessions=40, n_aids=30, mean_length=20, seed=3)
    L = 16
    packed = es.pack(max_len=L, keep="last")
    coeffs = np.asarray((1.0, 6.0, 3.0), np.float32)
    got, _ = recency_weighted_top_aids(
        packed.aids, packed.types, packed.mask, packed.lengths, coeffs, k=20
    )
    got = np.asarray(got)
    for s in range(es.n_sessions):
        lo, hi = es.offsets[s], es.offsets[s + 1]
        a, t = es.aid[lo:hi].tolist(), es.type[lo:hi].tolist()
        n = len(a)
        weights = np.logspace(0.1, 1, n, base=2, endpoint=True) - 1
        w = defaultdict(float)
        for j in range(max(0, n - L), n):  # only the packed tail
            w[a[j]] += weights[j] * coeffs[t[j]]
        expected = [x for x, _ in sorted(w.items(), key=lambda kv: -kv[1])][:20]
        row = [x for x in got[s] if x >= 0]
        assert row == expected


def test_per_aid_weight_top_generic():
    aids = np.array([[4, 7, 4, 9, 0]], np.int32)
    weights = np.array([[1.0, 5.0, 2.0, 4.0, 100.0]], np.float32)
    mask = np.array([[True, True, True, True, False]])
    got_a, got_w = per_aid_weight_top(aids, weights, mask, k=3)
    assert list(np.asarray(got_a)[0]) == [7, 9, 4]  # 5, 4, 3
    np.testing.assert_allclose(np.asarray(got_w)[0], [5.0, 4.0, 3.0])


def test_tie_break_insertion_order():
    # equal weights -> first-seen aid wins (stable sort semantics)
    aids = np.array([[5, 9, 2]], np.int32)
    weights = np.array([[1.0, 1.0, 1.0]], np.float32)
    mask = np.ones((1, 3), bool)
    got_a, _ = per_aid_weight_top(aids, weights, mask, k=3)
    assert list(np.asarray(got_a)[0]) == [5, 9, 2]
