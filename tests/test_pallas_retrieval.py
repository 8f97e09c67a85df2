"""Fused Pallas retrieval + peel row-top-k vs numpy oracles (interpret mode).

The peel kernel is deterministic (pop the max of every 128-window, R rounds),
so it has an exact numpy oracle.  The full retriever is validated by recall
against exact brute force plus exactness of the returned scores.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from otto_tpu.ops.pallas_retrieval import PallasRetriever
from otto_tpu.ops.row_topk import WINDOW, peel_rows, row_topk


# ---------------------------------------------------------------- peel ----
def _peel_oracle(x, rounds):
    x = x.copy()
    b, m = x.shape
    w = m // WINDOW
    vals = np.empty((b, rounds * w), x.dtype)
    cols = np.empty((b, rounds * w), np.int32)
    fill = np.iinfo(x.dtype).min if np.issubdtype(x.dtype, np.integer) else -np.inf
    x3 = x.reshape(b, w, WINDOW)
    for r in range(rounds):
        mx = x3.max(axis=2)
        am = x3.argmax(axis=2)
        vals[:, r * w:(r + 1) * w] = mx
        cols[:, r * w:(r + 1) * w] = am + np.arange(w)[None, :] * WINDOW
        x3[x3 == mx[:, :, None]] = fill
    return vals, cols


@pytest.mark.parametrize("dtype", [np.float32, np.int32])
def test_peel_rows_matches_oracle(dtype):
    rng = np.random.default_rng(0)
    b, m, rounds = 8, 512, 3
    if dtype == np.int32:
        x = rng.integers(0, 1 << 30, (b, m)).astype(dtype)
    else:
        x = rng.normal(size=(b, m)).astype(dtype)
    v, c = peel_rows(jnp.asarray(x), rounds, row_block=8, interpret=True)
    ev, ec = _peel_oracle(x, rounds)
    np.testing.assert_array_equal(np.asarray(v), ev)
    np.testing.assert_array_equal(np.asarray(c), ec)


def test_row_topk_exact_when_rounds_ge_k():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 1024)).astype(np.float32)
    v, i = row_topk(jnp.asarray(x), k=6, rounds=6, row_block=8, interpret=True)
    ev, ei = jax.lax.top_k(jnp.asarray(x), 6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ev))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))


def test_row_topk_small_row_falls_back():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(4, 100)).astype(np.float32))
    v, i = row_topk(x, k=5)
    ev, ei = jax.lax.top_k(x, 5)
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ei))


# ----------------------------------------------------------- retriever ----
@pytest.mark.parametrize("metric", ["dot", "euclidean"])
def test_retriever_high_recall_and_exact_scores(metric):
    rng = np.random.default_rng(0)
    n, d, b, k = 5 * 16384 + 123, 32, 16, 20
    items = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)

    r = PallasRetriever(items, metric=metric, interpret=True,
                        table_dtype=jnp.float32)
    s, i = r.topk(jnp.asarray(queries), k=k, tile=8, rounds=6,
                  exact_scores=True)
    s, i = np.asarray(s), np.asarray(i)
    # decoded (packed-key) scores agree with exact ones to the 7-lane-bit
    # truncation of the shifted score
    sd, idp = r.topk(jnp.asarray(queries), k=k, tile=8, rounds=6)
    np.testing.assert_array_equal(np.sort(np.asarray(idp)), np.sort(i))
    np.testing.assert_allclose(np.asarray(sd), s, atol=0.02)

    scores = queries @ items.T
    if metric == "euclidean":
        scores = 2.0 * scores - np.sum(items * items, axis=1)[None, :]
    exact_i = np.argsort(-scores, axis=1)[:, :k]

    # indices valid, no pads
    assert i.min() >= 0 and i.max() < n
    # returned scores are the exact metric scores of the returned items
    np.testing.assert_allclose(s, np.take_along_axis(scores, i, axis=1),
                               rtol=1e-5, atol=1e-4)
    # high recall vs exact brute force
    hits = sum(len(set(map(int, a)) & set(map(int, e)))
               for a, e in zip(i, exact_i))
    assert hits / (b * k) >= 0.9
    # descending order
    assert (np.diff(s, axis=1) <= 1e-5).all()


def test_retriever_rescore_survivors():
    """Survivor rescoring returns exact f32 scores for the items it picks and
    at least the recall of the packed-key path (it re-ranks the same survivor
    pool with exact scores)."""
    rng = np.random.default_rng(4)
    n, d, b, k = 5 * 16384 + 123, 32, 16, 20
    items = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)

    r = PallasRetriever(items, metric="euclidean", interpret=True)
    s, i = r.topk(jnp.asarray(queries), k=k, tile=8, rounds=6,
                  rescore_survivors=True)
    s, i = np.asarray(s), np.asarray(i)

    scores = 2.0 * (queries @ items.T) - np.sum(items * items, axis=1)[None, :]
    exact_i = np.argsort(-scores, axis=1)[:, :k]

    assert i.min() >= 0 and i.max() < n
    np.testing.assert_allclose(s, np.take_along_axis(scores, i, axis=1),
                               rtol=1e-5, atol=1e-4)
    assert (np.diff(s, axis=1) <= 1e-5).all()
    hits = sum(len(set(map(int, a)) & set(map(int, e)))
               for a, e in zip(i, exact_i))
    assert hits / (b * k) >= 0.9

    # the pool-selection (packed, bf16) path cannot beat exact rescoring of
    # the same pool
    sp, ip = r.topk(jnp.asarray(queries), k=k, tile=8, rounds=6)
    hits_p = sum(len(set(map(int, a)) & set(map(int, e)))
                 for a, e in zip(np.asarray(ip), exact_i))
    assert hits >= hits_p


def test_retriever_tiny_table_dense_fallback():
    rng = np.random.default_rng(3)
    items = rng.normal(size=(500, 16)).astype(np.float32)
    queries = rng.normal(size=(7, 16)).astype(np.float32)
    r = PallasRetriever(items, metric="dot", interpret=True)
    s, i = r.topk(jnp.asarray(queries), k=10)
    exact = np.argsort(-(queries @ items.T), axis=1)[:, :10]
    np.testing.assert_array_equal(np.asarray(i), exact)


@pytest.mark.parametrize("metric", ["dot", "euclidean"])
def test_retriever_compensated_precision(metric):
    """The hi/lo-compensated bf16 table scores to ~f32 accuracy: decoded
    packed-key scores of a compensated retriever match the exact f32 metric
    scores of the returned items far beyond bf16 resolution, and its recall
    is at least that of the plain-bf16 table on the same data."""
    rng = np.random.default_rng(11)
    n, d, b, k = 5 * 16384 + 123, 32, 16, 20
    items = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)

    rc = PallasRetriever(items, metric=metric, interpret=True,
                         precision="compensated")
    assert rc.items_aug_t.shape[0] == 3 * (d + 2)
    s, i = rc.topk(jnp.asarray(queries), k=k, tile=8, rounds=6)
    s, i = np.asarray(s), np.asarray(i)

    scores = queries @ items.T
    if metric == "euclidean":
        scores = 2.0 * scores - np.sum(items * items, axis=1)[None, :]
    picked = np.take_along_axis(scores, i, axis=1)
    # compensated decode error: lane-bit truncation of the shifted score only
    # (~2^-17 of the shift) — two orders tighter than bf16's ~2^-8
    shift = np.abs(scores).max() * 4
    assert np.abs(s - picked).max() <= shift * 2.0**-15

    exact_i = np.argsort(-scores, axis=1)[:, :k]
    hits_c = sum(len(set(map(int, a)) & set(map(int, e)))
                 for a, e in zip(i, exact_i))

    rb = PallasRetriever(items, metric=metric, interpret=True)  # plain bf16
    _, ib = rb.topk(jnp.asarray(queries), k=k, tile=8, rounds=6)
    hits_b = sum(len(set(map(int, a)) & set(map(int, e)))
                 for a, e in zip(np.asarray(ib), exact_i))
    assert hits_c >= hits_b
    assert hits_c / (b * k) >= 0.9
