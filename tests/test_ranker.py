"""Ranking tower tests: loss properties, fold/negative-sampling protocol,
learning on separable synthetic features, and end-to-end recall lift."""

import numpy as np
import pytest

import jax.numpy as jnp

from otto_tpu.config import RankerConfig
from otto_tpu.models.ranker import (
    FeatureNormalizer,
    RankerData,
    RankerModel,
    bce_loss,
    group_kfold,
    lambdarank_loss,
    listwise_softmax_loss,
    negative_sample_mask,
    top_k_predictions,
    train_ranker,
)


def test_group_kfold_partitions_and_balances():
    sizes = np.array([100, 1, 1, 1, 50, 50, 30, 40, 2, 5])
    folds = group_kfold(sizes, 3)
    assert folds.shape == (10,)
    assert set(folds) == {0, 1, 2}
    totals = [sizes[folds == f].sum() for f in range(3)]
    assert max(totals) - min(totals) <= 100  # roughly balanced


def test_negative_sample_mask():
    rng = np.random.default_rng(0)
    labels = np.array([[1, 0, 0, 0], [0, 0, 0, 0]], np.int8)
    mask = np.ones((2, 4), bool)
    keep = negative_sample_mask(labels, mask, ratio=0.5, rng=rng)
    assert keep[0, 0]  # positive always kept
    assert not keep[1].any()  # no-positive session fully dropped


def test_lambdarank_prefers_correct_order():
    labels = jnp.asarray(np.array([[1, 0, 0]], np.int8))
    mask = jnp.ones((1, 3), bool)
    good = lambdarank_loss(jnp.asarray([[5.0, 1.0, 0.0]]), labels, mask)
    bad = lambdarank_loss(jnp.asarray([[0.0, 1.0, 5.0]]), labels, mask)
    assert float(good) < float(bad)


def test_listwise_and_bce_losses_finite():
    labels = jnp.asarray(np.array([[1, 0], [0, 0]], np.int8))
    mask = jnp.asarray(np.array([[True, True], [True, False]]))
    scores = jnp.asarray([[1.0, -1.0], [0.5, 0.3]])
    for loss in (listwise_softmax_loss, bce_loss):
        v = float(loss(scores, labels, mask))
        assert np.isfinite(v)


def _make_separable(S=400, C=16, F=8, seed=0):
    """Labels correlate with feature 0; other features are noise."""
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(S, C, F)).astype(np.float32)
    logits = 2.0 * feats[:, :, 0]
    labels = (rng.random((S, C)) < 1 / (1 + np.exp(-logits + 2.0))).astype(np.int8)
    mask = np.ones((S, C), bool)
    cands = rng.integers(0, 1000, (S, C)).astype(np.int32)
    return RankerData(feats, labels, mask, np.arange(S), cands, [f"f{i}" for i in range(F)])


@pytest.mark.parametrize("loss", ["lambdarank", "listwise_softmax", "bce"])
def test_ranker_learns_separable(loss):
    data = _make_separable()
    cfg = RankerConfig(hidden_dims=(32, 16), loss=loss, n_folds=3, epochs=20,
                       batch_sessions=128, learning_rate=1e-2, dropout=0.0)
    model, oof = train_ranker(data, cfg)
    # OOF scores must rank positives above negatives far better than chance
    pos = oof[(data.labels == 1) & np.isfinite(oof)]
    neg = oof[(data.labels == 0) & np.isfinite(oof)]
    from otto_tpu.eval.model_metrics import roc_auc

    auc = roc_auc(
        np.concatenate([np.ones_like(pos), np.zeros_like(neg)]),
        np.concatenate([pos, neg]),
    )
    assert auc > 0.8, (loss, auc)


def test_ranker_save_load_predict(tmp_path):
    data = _make_separable(S=100)
    cfg = RankerConfig(hidden_dims=(16,), loss="bce", n_folds=2, epochs=3,
                       batch_sessions=64, dropout=0.0)
    model, _ = train_ranker(data, cfg)
    p1 = model.predict(data.features, data.mask)
    model.save(tmp_path / "ranker.npz")
    loaded = RankerModel.load(tmp_path / "ranker.npz", cfg)
    p2 = loaded.predict(data.features, data.mask)
    np.testing.assert_allclose(p1, p2, rtol=1e-5)


def test_top_k_predictions():
    cands = np.array([[7, 8, 9]], np.int32)
    scores = np.array([[0.1, 5.0, -np.inf]], np.float32)
    out = top_k_predictions(cands, scores, k=2)
    assert list(out[0]) == [8, 7]
    out3 = top_k_predictions(cands, scores, k=3)
    assert list(out3[0]) == [8, 7, -1]  # -inf (masked) becomes padding


def test_normalizer_handles_nan():
    f = np.array([[[1.0, np.nan], [3.0, 2.0]]], np.float32)
    m = np.ones((1, 2), bool)
    norm = FeatureNormalizer.fit(f, m)
    out = norm(f)
    assert np.isfinite(out).all()
