"""SGNS embedding trainer tests: pair generation vs oracle, and learned
structure on clustered synthetic data."""

import numpy as np

from otto_tpu.config import SGNSConfig
from otto_tpu.data.events import EventStore
from otto_tpu.data.synthetic import synthetic_events  # noqa: F401
from otto_tpu.models.embeddings import SGNSModel, skipgram_pairs, train_sgns


def test_skipgram_pairs_within_window_and_session():
    session = np.array([1, 1, 1, 2, 2])
    aid = np.array([10, 11, 12, 20, 21])
    ts = np.arange(5)
    typ = np.zeros(5, np.int8)
    es = EventStore.from_flat(session, aid, ts, typ)
    rng = np.random.default_rng(0)
    c, x = skipgram_pairs(es, window=2, rng=rng)
    pairs = set(zip(c.tolist(), x.tolist()))
    # never across sessions
    for a, b in pairs:
        assert (a < 20) == (b < 20)
    # all pairs are within distance 2 in the same session
    pos = {10: 0, 11: 1, 12: 2, 20: 0, 21: 1}
    for a, b in pairs:
        assert abs(pos[a] - pos[b]) <= 2
    assert len(pairs) > 0


def test_skipgram_no_self_pairs():
    session = np.ones(6, np.int64)
    aid = np.array([7, 7, 8, 7, 9, 8])
    es = EventStore.from_flat(session, aid, np.arange(6), np.zeros(6, np.int8))
    rng = np.random.default_rng(1)
    c, x = skipgram_pairs(es, window=3, rng=rng)
    assert np.all(c != x)


def test_sgns_learns_cluster_structure(tmp_path):
    """On a corpus with pure block structure (sessions confined to aid
    clusters), within-cluster euclidean distances must collapse well below
    cross-cluster ones.  Euclidean is the retrieval metric downstream,
    matching the reference's Annoy index."""
    rng = np.random.default_rng(0)
    S, L, n_clusters, per = 2000, 10, 4, 10
    n_aids = n_clusters * per
    sess = np.repeat(np.arange(S), L)
    clus = rng.integers(0, n_clusters, S)
    aid = (np.repeat(clus, L) * per + rng.integers(0, per, S * L)).astype(np.int64)
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))

    cfg = SGNSConfig(dim=8, window=4, negatives=5, epochs=15, batch_centers=8192, subsample_t=0)
    model = train_sgns(es, n_aids=n_aids, config=cfg)
    emb = model.embeddings

    din, dout = [], []
    for a in range(n_aids):
        for b in range(a + 1, n_aids):
            d = np.linalg.norm(emb[a] - emb[b])
            (din if a // per == b // per else dout).append(d)
    assert np.mean(din) < 0.6 * np.mean(dout), (np.mean(din), np.mean(dout))

    # round trip
    model.save(tmp_path / "sgns.npz")
    loaded = SGNSModel.load(tmp_path / "sgns.npz", cfg)
    np.testing.assert_array_equal(loaded.w_in, model.w_in)

    # neighbor table: top neighbor is in the same cluster for most aids
    table = model.neighbor_table(k=5, query_batch=64, block=128)
    assert table.shape == (n_aids, 5)
    same_cluster = np.mean(table[:, 0] // per == np.arange(n_aids) // per)
    assert same_cluster > 0.9


def test_sgns_checkpoint_resume(tmp_path):
    """An interrupted run resumed from its checkpoint must match an
    uninterrupted run exactly (same RNG stream, same lr schedule)."""
    rng = np.random.default_rng(5)
    S, L = 300, 8
    sess = np.repeat(np.arange(S), L)
    aid = rng.integers(0, 30, S * L)
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))
    cfg = SGNSConfig(dim=8, window=3, negatives=4, epochs=4, batch_centers=2048, subsample_t=0)

    full = train_sgns(es, 30, cfg)

    ck = tmp_path / "ck"
    # simulate preemption after 2 epochs of the same 4-epoch schedule
    train_sgns(es, 30, cfg, checkpoint_dir=ck, stop_after_epochs=2)
    resumed = train_sgns(es, 30, cfg, checkpoint_dir=ck)

    np.testing.assert_allclose(resumed.w_in, full.w_in, rtol=1e-5, atol=1e-6)


def test_session_embedding_model_recovers_cluster():
    # Doc2Vec analog: two disjoint aid vocabularies with separable item
    # embeddings; similar-session retrieval must stay within the query's half
    import numpy as np

    from otto_tpu.data.events import EventStore
    from otto_tpu.models.embeddings import SessionEmbeddingModel, session_embeddings

    rng = np.random.default_rng(0)
    S, L = 200, 8
    sess = np.repeat(np.arange(S), L)
    half = (np.arange(S) % 2).repeat(L)
    aid = np.where(half == 0, rng.integers(0, 20, S * L), rng.integers(20, 40, S * L))
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))

    # synthetic item table: the two halves live in orthogonal subspaces
    item_emb = np.zeros((40, 8), np.float32)
    item_emb[:20, :4] = rng.normal(size=(20, 4))
    item_emb[20:, 4:] = rng.normal(size=(20, 4))

    vecs = session_embeddings(es, item_emb)
    assert vecs.shape == (S, 8)
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-5)

    model = SessionEmbeddingModel.fit(es, item_emb)
    queries = es.select_sessions(np.arange(0, 20))
    preds = model.similar_session_predictions(queries, n_similar=3, k=10, query_batch=32)
    correct = total = 0
    for r in range(20):
        own_half = r % 2
        for a in preds["clicks"][r]:
            if a < 0:
                continue
            total += 1
            correct += (a < 20) == (own_half == 0)
    assert total > 0
    assert correct / total > 0.9
