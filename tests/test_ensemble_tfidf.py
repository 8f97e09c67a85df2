"""Ensemble blending + TF-IDF model tests."""

import numpy as np
import pytest

from otto_tpu.data.synthetic import synthetic_events
from otto_tpu.models.ensemble import ModelPredictions, blend, robust_scale
from otto_tpu.models.tfidf import TfIdfModel, tfidf_weights


def test_robust_scale_matches_sklearn_semantics():
    x = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    out = robust_scale(x)
    med = 3.0
    iqr = 4.0 - 2.0
    np.testing.assert_allclose(out, (x - med) / iqr)
    # constant input: centered, not scaled
    np.testing.assert_allclose(robust_scale(np.full(4, 7.0)), np.zeros(4))


def test_blend_outer_join_and_topk():
    a = ModelPredictions(
        session=np.array([1, 1, 2]), aid=np.array([10, 11, 20], np.int32),
        score=np.array([1.0, 0.5, 2.0], np.float32),
    )
    b = ModelPredictions(
        session=np.array([1, 2, 2]), aid=np.array([11, 20, 21], np.int32),
        score=np.array([3.0, 0.1, 5.0], np.float32),
    )
    sessions, top = blend({"a": a, "b": b}, {"a": 0.5, "b": 0.5}, k=2, scale=False)
    np.testing.assert_array_equal(sessions, [1, 2])
    # session 1: aid 10 -> 0.5, aid 11 -> 0.25 + 1.5 = 1.75 -> [11, 10]
    assert list(top[0]) == [11, 10]
    # session 2: aid 20 -> 1.0 + 0.05, aid 21 -> 2.5 -> [21, 20]
    assert list(top[1]) == [21, 20]


def test_blend_pads_missing():
    a = ModelPredictions(np.array([5]), np.array([9], np.int32), np.array([1.0], np.float32))
    sessions, top = blend({"a": a}, {"a": 1.0}, k=3, scale=False)
    assert list(top[0]) == [9, -1, -1]


def test_tfidf_weights_df():
    es = synthetic_events(n_sessions=50, n_aids=40, seed=91)
    w, idf = tfidf_weights(es, 40)
    assert w.shape == (es.n_events,)
    assert np.all(w > 0)
    # frequent aids get lower idf
    counts = np.bincount(es.aid, minlength=40)
    present = counts > 0
    top = np.argmax(counts)
    rare = np.argmin(np.where(present, counts, 1 << 30))
    assert idf[top] <= idf[rare]


def test_tfidf_similar_sessions_recover_cluster():
    # two disjoint aid vocabularies; queries should retrieve aids from their
    # own half
    rng = np.random.default_rng(0)
    S, L = 200, 8
    sess = np.repeat(np.arange(S), L)
    half = (np.arange(S) % 2).repeat(L)
    aid = np.where(half == 0, rng.integers(0, 20, S * L), rng.integers(20, 40, S * L))
    from otto_tpu.data.events import EventStore

    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))
    model = TfIdfModel.fit(es, n_aids=40, dim=64)
    queries = es.select_sessions(np.arange(0, 20))
    preds = model.similar_session_predictions(queries, n_similar=3, k=10, query_batch=32)
    correct = 0
    total = 0
    for r in range(20):
        own_half = r % 2
        for a in preds["clicks"][r]:
            if a < 0:
                continue
            total += 1
            if (a < 20) == (own_half == 0):
                correct += 1
    assert total > 0
    assert correct / total > 0.9


def test_blend_from_candidate_sets():
    """Ensemble.blend over flattened per-model candidate scores (the
    cross-model path the reference's ranker/inference.py takes)."""
    rng = np.random.default_rng(7)
    S, C = 30, 10
    sessions = np.arange(100, 100 + S)
    cands = rng.integers(0, 500, (S, C)).astype(np.int32)
    scores_a = rng.random((S, C)).astype(np.float32)
    scores_b = rng.random((S, C)).astype(np.float32)

    def flat(scores):
        return ModelPredictions(
            session=np.repeat(sessions, C),
            aid=cands.reshape(-1),
            score=scores.reshape(-1),
        )

    out_sessions, top = blend({"a": flat(scores_a), "b": flat(scores_b)},
                              {"a": 0.7, "b": 0.3}, k=5)
    np.testing.assert_array_equal(out_sessions, sessions)
    # spot-check one session against a numpy oracle
    from otto_tpu.models.ensemble import robust_scale

    sa = robust_scale(scores_a.reshape(-1).astype(np.float64)).reshape(S, C)
    sb = robust_scale(scores_b.reshape(-1).astype(np.float64)).reshape(S, C)
    s0 = {}
    for c, va, vb in zip(cands[0], sa[0], sb[0]):
        s0[int(c)] = s0.get(int(c), 0.0) + 0.7 * va + 0.3 * vb
    expected = [a for a, _ in sorted(s0.items(), key=lambda kv: -kv[1])][:5]
    assert list(top[0][: len(expected)]) == expected
