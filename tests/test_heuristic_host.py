"""Unit tests for the float64 host recency accumulator
(otto_tpu/models/heuristic_host.py) against hand-computed Counter semantics."""

import numpy as np

from otto_tpu.models.heuristic_host import (
    _chain_votes,
    _topk_by_weight,
    _typed_unique,
    recency_route_host_f64,
)
from otto_tpu.data.events import EventStore


def test_typed_unique_ascending_per_session():
    sess = np.array([0, 0, 0, 1, 1])
    aid = np.array([5, 3, 5, 9, 2])
    keep = np.array([True, True, True, True, False])
    s, a = _typed_unique(sess, aid, keep)
    np.testing.assert_array_equal(s, [0, 0, 1])
    np.testing.assert_array_equal(a, [3, 5, 9])


def test_chain_votes_order_and_padding():
    table = np.array([[7, 8, -1], [9, -1, -1]], np.int32)
    u_sess = np.array([0, 0])
    u_aid = np.array([0, 1])
    s, a, o = _chain_votes(u_sess, u_aid, table)
    np.testing.assert_array_equal(a, [7, 8, 9])  # -1 dropped, chain order kept
    np.testing.assert_array_equal(o, [0, 1, 2])  # per-session insertion order


def test_topk_by_weight_counter_semantics():
    # session 0: aid 1 w=2.0 (first pos 0), aid 2 w=2.0 (first pos 1),
    # aid 3 w=5.0 -> order [3, 1, 2] (weight desc, first-insertion asc)
    sess = np.array([0, 0, 0, 0, 0])
    aid = np.array([1, 2, 1, 2, 3])
    w = np.array([1.0, 1.5, 1.0, 0.5, 5.0])
    seq = np.array([0, 1, 2, 3, 4])
    out = _topk_by_weight(sess, aid, w, seq, 1, 3)
    np.testing.assert_array_equal(out, [[3, 1, 2]])


def test_recency_route_matches_manual_counter():
    # one session, >= 20 uniques not required here (route fn is direct)
    aids = list(range(25))
    types = [0] * 25
    es = EventStore.from_flat(
        np.zeros(25, np.int64), np.array(aids, np.int32),
        np.arange(25, dtype=np.int64), np.array(types, np.int8),
    )
    tables = {k: np.full((30, 15), -1, np.int32)
              for k in ("time_weighted", "cart_weighted", "cart_order")}
    preds = recency_route_host_f64(es, np.array([0]), tables, None, k=20)
    # pure log-recency: most recent aids win (weights increase with position)
    expect = list(range(24, 4, -1))
    np.testing.assert_array_equal(preds["clicks"][0], expect)
