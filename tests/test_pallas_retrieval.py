"""Fused Pallas top-k retrieval vs numpy oracle (interpret mode on CPU).

The kernel's windowed-max structure is deterministic: for every query, each
run of 128 consecutive items contributes exactly its max-scoring item.  The
oracle reproduces that reduction in numpy, so scores/indices must match
bit-for-bit (modulo bf16 table rounding, which the oracle also applies).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from otto_tpu.ops.pallas_retrieval import WINDOW, PallasRetriever


def _oracle(queries, items, k, metric, n_pad):
    q = queries.astype(jnp.bfloat16).astype(np.float32)  # retriever casts q too
    it = items.astype(jnp.bfloat16).astype(np.float32)
    s = q @ it.T
    if metric == "euclidean":
        # the retriever computes norms from the *unrounded* f32 table
        s = 2.0 * s - np.sum(items.astype(np.float32) ** 2, axis=1)[None, :]
    pad = n_pad - s.shape[1]
    s = np.pad(s, ((0, 0), (0, pad)), constant_values=-3.0e38)
    b, n = s.shape
    s3 = s.reshape(b, n // WINDOW, WINDOW)
    wmax = s3.max(axis=2)
    warg = s3.argmax(axis=2) + np.arange(n // WINDOW)[None, :] * WINDOW
    order = np.argsort(-wmax, axis=1, kind="stable")[:, :k]
    rows = np.arange(b)[:, None]
    return wmax[rows, order], warg[rows, order]


@pytest.mark.parametrize("metric", ["dot", "euclidean"])
def test_windowed_topk_matches_oracle(metric):
    rng = np.random.default_rng(3)
    n, d, b, k = 700, 32, 9, 5
    items = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)

    r = PallasRetriever(items, metric=metric, block=256, interpret=True)
    s, i = r.topk(jnp.asarray(queries), k=k, tile=8)
    es, ei = _oracle(queries, items, k, metric, r.items_t.shape[1])

    np.testing.assert_allclose(np.asarray(s), es, rtol=2e-2, atol=1e-1)
    # indices must agree wherever window maxima are not near-ties
    gap = np.abs(np.diff(es, axis=1)).min()
    if gap > 1e-3:
        np.testing.assert_array_equal(np.asarray(i), ei)


def test_high_recall_vs_exact():
    """With random data the windowed reduction recovers nearly all of the
    exact top-k (misses only same-window collisions)."""
    rng = np.random.default_rng(0)
    n, d, b, k = 32768, 32, 16, 5  # 256 windows -> ~1.6% per-entry miss rate
    items = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(b, d)).astype(np.float32)

    r = PallasRetriever(items, metric="dot", block=2048, interpret=True,
                        table_dtype=jnp.float32)
    _, i = r.topk(jnp.asarray(queries), k=k, tile=8)
    exact = np.argsort(-(queries @ items.T), axis=1)[:, :k]
    hits = sum(len(set(map(int, a)) & set(map(int, e))) for a, e in zip(np.asarray(i), exact))
    assert hits / (b * k) >= 0.9


def test_padding_never_returned():
    rng = np.random.default_rng(1)
    items = rng.normal(size=(130, 32)).astype(np.float32) - 10.0  # all-negative dots unlikely; force many pads
    queries = rng.normal(size=(3, 32)).astype(np.float32)
    r = PallasRetriever(items, metric="dot", block=256, interpret=True)
    _, i = r.topk(jnp.asarray(queries), k=20, tile=8)
    assert np.asarray(i).max() < 130
    assert np.asarray(i).min() >= 0
