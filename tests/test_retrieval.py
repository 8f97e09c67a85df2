"""Retrieval (Annoy replacement) tests vs numpy brute force."""

import numpy as np
import pytest

from otto_tpu.ops.retrieval import build_neighbor_table, topk_scan


@pytest.mark.parametrize("metric", ["dot", "euclidean"])
def test_topk_scan_matches_bruteforce(metric):
    rng = np.random.default_rng(0)
    items = rng.normal(size=(1000, 32)).astype(np.float32)
    q = rng.normal(size=(17, 32)).astype(np.float32)
    s, i = topk_scan(q, items, k=10, block=128, metric=metric)
    s, i = np.asarray(s), np.asarray(i)
    if metric == "dot":
        full = q @ items.T
    else:
        full = 2 * q @ items.T - np.sum(items**2, axis=1)[None, :]
    exp_i = np.argsort(-full, axis=1, kind="stable")[:, :10]
    # scores must match exactly; indices may differ only on exact ties
    np.testing.assert_allclose(s, np.take_along_axis(full, exp_i, axis=1), rtol=1e-4, atol=1e-5)
    same = (i == exp_i).mean()
    assert same > 0.99


def test_topk_scan_block_bigger_than_n():
    rng = np.random.default_rng(1)
    items = rng.normal(size=(37, 8)).astype(np.float32)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    s, i = topk_scan(q, items, k=5, block=64, metric="dot")
    full = q @ items.T
    exp_i = np.argsort(-full, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(s), np.take_along_axis(full, exp_i, axis=1), rtol=1e-4, atol=1e-5)
    assert np.asarray(i).max() < 37


def test_neighbor_table_excludes_self():
    rng = np.random.default_rng(2)
    emb = rng.normal(size=(300, 16)).astype(np.float32)
    table = build_neighbor_table(emb, k=5, metric="euclidean", query_batch=64, block=128)
    assert table.shape == (300, 5)
    for r in range(300):
        assert r not in table[r]
    # euclidean nearest neighbor check on a few rows
    for r in range(0, 300, 37):
        d = np.sum((emb - emb[r]) ** 2, axis=1)
        d[r] = np.inf
        assert table[r, 0] == np.argmin(d)


def test_neighbor_table_with_scores():
    rng = np.random.default_rng(3)
    emb = rng.normal(size=(100, 8)).astype(np.float32)
    table, scores = build_neighbor_table(
        emb, k=4, metric="dot", exclude_self=False, query_batch=32, block=64, scores_out=True
    )
    full = emb @ emb.T
    for r in range(0, 100, 11):
        exp = np.sort(full[r])[::-1][:4]
        np.testing.assert_allclose(scores[r], exp, rtol=1e-5)


def test_topk_approx_matches_exact_on_small():
    from otto_tpu.ops.retrieval import topk_approx

    rng = np.random.default_rng(5)
    items = rng.normal(size=(2000, 16)).astype(np.float32)
    q = rng.normal(size=(33, 16)).astype(np.float32)
    s_a, i_a = topk_approx(q, items, k=10, tile=16, metric="euclidean",
                           recall_target=0.999)
    s_e, i_e = topk_scan(q, items, k=10, block=512, metric="euclidean")
    # overlap of returned neighbor sets must be near-perfect
    overlap = np.mean([
        len(set(np.asarray(i_a)[r]) & set(np.asarray(i_e)[r])) / 10 for r in range(33)
    ])
    assert overlap > 0.95
    # returned scores are exact scores of returned indices
    full = 2 * q @ items.T - np.sum(items**2, axis=1)[None, :]
    ia = np.asarray(i_a)
    np.testing.assert_allclose(
        np.asarray(s_a), np.take_along_axis(full, ia, axis=1), rtol=1e-4, atol=1e-4
    )


def test_neighbor_table_pallas_backend_agrees():
    rng = np.random.default_rng(5)
    emb = rng.normal(size=(400, 16)).astype(np.float32)
    a = build_neighbor_table(emb, k=5, metric="euclidean", query_batch=64, block=128)
    b = build_neighbor_table(emb, k=5, metric="euclidean", query_batch=64,
                             block=128, backend="pallas")
    # tiny table -> pallas backend takes its exact dense path; rows must agree
    assert (a == b).mean() > 0.98


def test_topk_hybrid_matches_exact_smallish():
    import jax.numpy as jnp
    from otto_tpu.ops.retrieval import topk_hybrid

    rng = np.random.default_rng(11)
    items = rng.normal(size=(65536, 16)).astype(np.float32)
    q = rng.normal(size=(64, 16)).astype(np.float32)
    s, i = topk_hybrid(jnp.asarray(q), jnp.asarray(items), k=5,
                       tile=32, metric="euclidean")
    sc = 2.0 * q @ items.T - np.sum(items**2, axis=1)[None, :]
    exact = np.argsort(-sc, axis=1)[:, :5]
    i = np.asarray(i)
    hits = sum(len(set(map(int, a)) & set(map(int, e))) for a, e in zip(i, exact))
    assert hits / i.size >= 0.95
    np.testing.assert_allclose(
        np.asarray(s), np.take_along_axis(sc, i, axis=1), rtol=1e-5, atol=1e-4
    )


def test_topk_hybrid_int8_recall_and_scores():
    """int8-quantized retrieval: >= 0.95 top-k recall vs the exact f32
    ranking, scores within the product-quantization rounding bound, and the
    build_neighbor_table backend round-trips."""
    import jax.numpy as jnp
    from otto_tpu.ops.retrieval import quantize_items_int8, topk_hybrid_int8

    rng = np.random.default_rng(12)
    items = rng.normal(size=(65536, 32)).astype(np.float32)
    q = rng.normal(size=(64, 32)).astype(np.float32)
    q8, scale, sq = quantize_items_int8(jnp.asarray(items))
    # dequantization error bounded by scale/2 per element
    deq = np.asarray(q8, np.float32) * np.asarray(scale)[:, None]
    assert np.abs(deq - items).max() <= np.asarray(scale).max() / 2 + 1e-6

    for metric in ("dot", "euclidean"):
        s, i = topk_hybrid_int8(jnp.asarray(q), q8, scale, sq, k=5,
                                tile=32, metric=metric)
        sc = q @ items.T
        if metric == "euclidean":
            sc = 2.0 * sc - np.sum(items**2, axis=1)[None, :]
        exact = np.argsort(-sc, axis=1)[:, :5]
        i = np.asarray(i)
        hits = sum(len(set(map(int, a)) & set(map(int, e)))
                   for a, e in zip(i, exact))
        assert hits / i.size >= 0.95, metric
        # returned scores match the true f32 score of the returned item to
        # within the two-sided int8 rounding (~2/127 of the dot magnitude;
        # euclidean cancels 2.dot against ||x||^2, so normalize by the
        # component magnitudes, not the cancelled result)
        true_s = np.take_along_axis(sc, i, axis=1)
        base = 2.0 * np.abs(q @ items.T)
        denom = np.maximum(np.take_along_axis(base, i, axis=1), 1.0)
        assert (np.abs(np.asarray(s) - true_s) / denom).max() < 0.05, metric


def test_neighbor_table_int8_backend_agrees():
    rng = np.random.default_rng(13)
    emb = rng.normal(size=(2048, 16)).astype(np.float32)
    t_exact = build_neighbor_table(emb, k=10, exact=True, query_batch=512)
    t_q8 = build_neighbor_table(emb, k=10, backend="int8", query_batch=512)
    overlap = np.mean([len(set(a) & set(b)) / 10.0
                       for a, b in zip(t_exact, t_q8)])
    assert overlap >= 0.9
