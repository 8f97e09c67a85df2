"""Serving-route tests: embedding-kNN recommender routing and the sequence
model's 3-way routing."""

import numpy as np

from otto_tpu.data.events import EventStore
from otto_tpu.models.embeddings import embedding_knn_predictions, recursive_neighbors
from otto_tpu.models.sequence import SequenceModel, init_params, sequence_serving_predictions
from otto_tpu.config import SequenceModelConfig

import jax


def make_store(sessions):
    sess, aid, ts, typ = [], [], [], []
    for i, (aids, types) in enumerate(sessions):
        sess += [i] * len(aids)
        aid += aids
        ts += list(range(len(aids)))
        typ += types
    return EventStore.from_flat(
        np.array(sess), np.array(aid), np.array(ts), np.array(typ, np.int8)
    )


def test_embedding_knn_routing():
    # session 0: 25 distinct aids -> recency route; session 1: 3 aids -> kNN
    long_aids = list(range(25))
    short_aids = [40, 41, 40]
    store = make_store([
        (long_aids, [0] * 25),
        (short_aids, [0, 1, 0]),
    ])
    table = np.tile(np.arange(50, 60, dtype=np.int32), (100, 1))  # everyone's neighbors
    preds = embedding_knn_predictions(store, table, k=20)
    p0 = preds["clicks"][0]
    assert (p0 >= 0).sum() == 20
    assert set(p0.tolist()) <= set(long_aids)  # recency route: only session aids
    p1 = preds["clicks"][1]
    got = [int(a) for a in p1 if a >= 0]
    # ascending unique session aids first, then neighbors of last aid
    assert got[:2] == [40, 41]
    assert got[2:] == list(range(50, 60))


def test_recursive_neighbors_walks_graph():
    table = np.array([
        [1, 2],  # 0 -> 1
        [2, 0],  # 1 -> 2
        [3, 0],  # 2 -> 3
        [0, 1],  # 3 -> 0 (cycle)
    ], np.int32)
    out = recursive_neighbors(table, 0, n=5, exclude=set())
    assert out == [1, 2, 3]  # walk stops when everything is seen


def test_sequence_serving_routes():
    cfg = SequenceModelConfig(n_aids=50, dim=8, hidden=8, max_len=5)
    model = SequenceModel(init_params(jax.random.PRNGKey(0), 50, 8, 8), cfg)
    long_aids = list(range(22))
    store = make_store([
        (long_aids, [0] * 22),  # recency route
        ([5, 6], [0, 0]),  # model route
        ([7, 30], [0, 0]),  # fallback route (30 not trained)
    ])
    trained = np.ones(50, bool)
    trained[30] = False
    ft = np.tile(np.arange(10, 15, dtype=np.int32), (50, 1))
    preds = sequence_serving_predictions(store, model, trained, ft, k=5)
    p = preds["clicks"]
    assert set(p[0][p[0] >= 0].tolist()) <= set(long_aids)
    assert (p[1] >= 0).all()  # model route gives full k
    assert p[2][:5].tolist() == [10, 11, 12, 13, 14]  # fallback kNN row
