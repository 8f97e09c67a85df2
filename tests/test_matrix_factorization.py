"""MF/CF trainer tests: pair construction semantics + learning sanity +
model-metric oracles."""

import numpy as np
import pytest

from otto_tpu.config import CFConfig, MFConfig
from otto_tpu.data.events import EventStore
from otto_tpu.data.synthetic import synthetic_events
from otto_tpu.eval.model_metrics import classification_scores, regression_scores, roc_auc
from otto_tpu.models.matrix_factorization import (
    CFModel,
    MFModel,
    cf_pairs_diff,
    cf_pairs_time,
    mf_samples,
    train_cf,
    train_mf,
)


def test_cf_pairs_diff_semantics():
    session = np.array([1, 1, 1, 2, 2])
    aid = np.array([10, 11, 12, 20, 21])
    es = EventStore.from_flat(session, aid, np.arange(5), np.zeros(5, np.int8))
    rng = np.random.default_rng(0)
    x1, x2, y = cf_pairs_diff(es, rng)
    pairs = set(zip(x1.tolist(), x2.tolist()))
    # positives (consecutive) must be present with label 1
    pos = {(10, 11), (11, 12), (20, 21)}
    got = {(a, b): float(t) for a, b, t in zip(x1, x2, y)}
    for p in pos:
        assert got.get(p) == 1.0, (p, got)
    # no self pairs, no cross-session pairs
    for a, b in pairs:
        assert a != b
        assert (a < 20) == (b < 20)


def test_cf_pairs_time_semantics():
    # two events 30 min apart (positive), two 5 h apart (negative)
    session = np.array([1, 1, 2, 2])
    aid = np.array([5, 6, 7, 8])
    ts = np.array([0, 1800, 0, 5 * 3600])
    es = EventStore.from_flat(session, aid, ts, np.zeros(4, np.int8))
    rng = np.random.default_rng(0)
    x1, x2, y = cf_pairs_time(es, rng, hour_difference=1.0, sample_frac=1.0)
    d = {(a, b): t for a, b, t in zip(x1.tolist(), x2.tolist(), y.tolist())}
    assert d[(5, 6)] == 1.0  # forward within the hour
    assert d[(6, 5)] == 0.0  # backward dt < 0
    assert d[(7, 8)] == 0.0  # 5h apart


def test_mf_samples(small_events):
    s, a, t = mf_samples(small_events)
    assert len(s) == small_events.n_events
    np.testing.assert_array_equal(t, small_events.type.astype(np.float32))
    assert s.max() == small_events.n_sessions - 1


def test_train_cf_learns():
    # block structure: consecutive aids come from the same cluster
    rng = np.random.default_rng(0)
    S, L, per = 800, 8, 10
    sess = np.repeat(np.arange(S), L)
    clus = rng.integers(0, 4, S)
    aid = (np.repeat(clus, L) * per + rng.integers(0, per, S * L)).astype(np.int64)
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))
    cfg = CFConfig(n_aids=40, n_factors=8, epochs=30, early_stopping_patience=10,
                   batch_size=8192, learning_rate=0.01)
    model = train_cf(es, n_aids=40, config=cfg)
    # in-cluster pair scores should exceed cross-cluster
    e = model.embeddings
    within = np.mean([e[i] @ e[j] for i in range(10) for j in range(10) if i != j])
    cross = np.mean([e[i] @ e[j + 10] for i in range(10) for j in range(10)])
    assert within > cross, (within, cross)
    assert len(model.history) > 1
    assert min(h["val_loss"] for h in model.history) <= model.history[0]["val_loss"]


def test_train_mf_learns(tmp_path):
    es = synthetic_events(n_sessions=300, n_aids=100, mean_length=8, seed=71)
    cfg = MFConfig(n_sessions=300, n_aids=100, n_factors=8, epochs=20,
                   early_stopping_patience=8, batch_size=4096, learning_rate=0.02)
    model = train_mf(es, n_aids=100, config=cfg)
    best = min(h["val_loss"] for h in model.history)
    assert best <= model.history[0]["val_loss"]
    model.save(tmp_path / "mf.npz")
    loaded = MFModel.load(tmp_path / "mf.npz", cfg)
    np.testing.assert_array_equal(loaded.aid_embeddings, model.aid_embeddings)


def test_roc_auc_matches_known_values():
    y = np.array([0, 0, 1, 1])
    s = np.array([0.1, 0.4, 0.35, 0.8])
    assert roc_auc(y, s) == pytest.approx(0.75)
    assert roc_auc(np.array([1, 1]), np.array([0.1, 0.2])) != roc_auc(y, s)  # nan path
    assert np.isnan(roc_auc(np.array([1, 1]), np.array([0.1, 0.2])))
    # perfect separation
    assert roc_auc(np.array([0, 1]), np.array([0.0, 1.0])) == 1.0
    # ties get average ranks
    assert roc_auc(np.array([0, 1]), np.array([0.5, 0.5])) == pytest.approx(0.5)


def test_score_dicts():
    c = classification_scores(np.array([0, 1, 1]), np.array([-1.0, 2.0, -0.5]))
    assert c["accuracy"] == pytest.approx(2 / 3)
    r = regression_scores(np.array([0.0, 2.0]), np.array([1.0, 2.0]))
    assert r["mean_absolute_error"] == pytest.approx(0.5)
    assert r["mean_squared_error"] == pytest.approx(0.5)
