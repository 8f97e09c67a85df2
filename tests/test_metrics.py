"""Metric tests against hand-computed examples and a numpy oracle of the
reference semantics (src/metrics.py:4-61)."""

import numpy as np
import pytest

from otto_tpu.data.labels import SessionLabels
from otto_tpu.eval.harness import evaluate_predictions
from otto_tpu.eval.metrics import (
    cart_order_recall_at_k,
    click_recall_at_k,
    corpus_recall_at_k,
    hits_at_k,
    weighted_recall,
)


def pad(rows, width, fill=-1):
    out = np.full((len(rows), width), fill, dtype=np.int32)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out


def test_hits_at_k():
    preds = pad([[1, 2, 3], [4, 5], []], 4)
    labels = pad([[2, 3, 9], [9], [1]], 3)
    np.testing.assert_array_equal(np.asarray(hits_at_k(preds, labels)), [2, 0, 0])


def test_click_recall():
    preds = pad([[1, 2], [3, 4], [5, 6]], 3)
    click = np.array([2, 9, -1], dtype=np.int32)
    r, n = click_recall_at_k(preds, click)
    assert int(n) == 2
    assert float(r) == pytest.approx(0.5)


def test_click_recall_no_valid():
    preds = pad([[1]], 2)
    r, n = click_recall_at_k(preds, np.array([-1], dtype=np.int32))
    assert int(n) == 0
    assert np.isnan(float(r))


def oracle_cart_order(y_true, y_pred):
    y_true, y_pred = set(y_true), set(y_pred)
    tp = len(y_true & y_pred)
    fn = len(y_true - y_pred)
    if tp + fn == 0:
        return np.nan
    return tp / min(20, tp + fn)


def test_cart_order_recall_vs_oracle():
    rng = np.random.default_rng(3)
    rows_p, rows_l = [], []
    for _ in range(100):
        rows_p.append(rng.choice(50, size=rng.integers(1, 21), replace=False).tolist())
        rows_l.append(rng.choice(50, size=rng.integers(0, 30), replace=False).tolist())
    preds = pad(rows_p, 20)
    labels = pad(rows_l, 30)
    r, n = cart_order_recall_at_k(preds, labels, k=20)
    oracle = [oracle_cart_order(l, p) for p, l in zip(rows_p, rows_l)]
    valid = [v for v in oracle if not np.isnan(v)]
    assert int(n) == len(valid)
    assert float(r) == pytest.approx(np.mean(valid), abs=1e-6)


def test_min20_denominator():
    # 25 labels, 20 predictions all hit -> recall = 20/min(20,25) = 1.0
    labels = pad([list(range(25))], 25)
    preds = pad([list(range(20))], 20)
    r, _ = cart_order_recall_at_k(preds, labels, k=20)
    assert float(r) == pytest.approx(1.0)


def test_corpus_recall():
    preds = pad([[1, 2], [3]], 2)
    labels = pad([[1, 9], [4]], 2)
    # hits = 1 + 0 ; denom = 2 + 1
    r = corpus_recall_at_k(preds, labels, k=20)
    assert float(r) == pytest.approx(1 / 3)


def test_weighted():
    assert weighted_recall(1.0, 0.5, 0.25) == pytest.approx(0.1 + 0.15 + 0.15)


def test_harness_end_to_end():
    S = 4
    labels = SessionLabels(
        session_ids=np.arange(S),
        click=np.array([5, -1, 7, 2], dtype=np.int32),
        cart_flat=np.array([1, 2, 3], dtype=np.int32),
        cart_offsets=np.array([0, 2, 3, 3, 3]),
        order_flat=np.array([9], dtype=np.int32),
        order_offsets=np.array([0, 0, 0, 1, 1]),
    )
    preds = pad([[5, 1], [2], [9, 7], [0]], 20)
    report = evaluate_predictions(labels, preds)
    assert report.clicks == pytest.approx(2 / 3)  # sessions 0,2 hit; 3 missed
    assert report.carts == pytest.approx((0.5 + 0.0) / 2)
    assert report.orders == pytest.approx(1.0)
    assert report.weighted == pytest.approx(
        weighted_recall(2 / 3, 0.25, 1.0)
    )


def test_map_at_k_hand_example():
    import jax.numpy as jnp

    from otto_tpu.eval.metrics import map_at_k

    # session 0: ranked rel = [1, 0, 1, 0] -> AP = (1/1 + 2/3) / 2 = 0.8333
    # session 1: ranked rel = [0, 1] (2 candidates) -> AP = (1/2) / 1 = 0.5
    # session 2: no positives -> excluded
    scores = jnp.asarray([
        [4.0, 3.0, 2.0, 1.0],
        [4.0, 3.0, -jnp.inf, -jnp.inf],
        [4.0, 3.0, 2.0, 1.0],
    ])
    labels = jnp.asarray([
        [1, 0, 1, 0],
        [0, 1, 0, 0],
        [0, 0, 0, 0],
    ])
    mask = jnp.asarray([
        [True, True, True, True],
        [True, True, False, False],
        [True, True, True, True],
    ])
    m = float(map_at_k(scores, labels, mask, k=20))
    expected = ((1.0 + 2.0 / 3.0) / 2.0 + 0.5) / 2.0
    assert abs(m - expected) < 1e-6, (m, expected)


def test_map_at_k_truncation():
    import jax.numpy as jnp

    from otto_tpu.eval.metrics import map_at_k

    # k=1: only the top-ranked candidate counts; denom = min(n_pos, k) = 1
    scores = jnp.asarray([[3.0, 2.0, 1.0]])
    labels = jnp.asarray([[0, 1, 1]])
    mask = jnp.ones((1, 3), bool)
    assert float(map_at_k(scores, labels, mask, k=1)) == 0.0
    # k=2: rel at rank 2 -> AP = (1/2)/min(2,2)... n_pos=2, denom=2 -> 0.25
    assert abs(float(map_at_k(scores, labels, mask, k=2)) - 0.25) < 1e-6
