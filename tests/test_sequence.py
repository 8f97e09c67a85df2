"""Sequential recommender tests: example construction + next-item learning on
a deterministic-transition corpus."""

import numpy as np

from otto_tpu.config import SequenceModelConfig
from otto_tpu.data.events import EventStore
from otto_tpu.models.sequence import SequenceModel, _training_examples, train_sequence_model


def test_training_examples_prefixes():
    session = np.array([1, 1, 1, 2, 2])
    aid = np.array([10, 11, 12, 20, 21])
    es = EventStore.from_flat(session, aid, np.arange(5), np.zeros(5, np.int8))
    seqs, masks, targets = _training_examples(es, max_len=3, n_aids=100)
    # examples: ([10]->11), ([10,11]->12), ([20]->21)
    assert len(targets) == 3
    rows = {tuple(seqs[i][masks[i]].tolist()): int(targets[i]) for i in range(3)}
    assert rows[(10,)] == 11
    assert rows[(10, 11)] == 12
    assert rows[(20,)] == 21


def test_training_examples_clip():
    session = np.ones(10, np.int64)
    aid = np.arange(10)
    es = EventStore.from_flat(session, aid, np.arange(10), np.zeros(10, np.int8))
    seqs, masks, targets = _training_examples(es, max_len=4, n_aids=100)
    # target 9's prefix is the last 4 predecessors [5,6,7,8]
    i = int(np.flatnonzero(targets == 9)[0])
    assert seqs[i][masks[i]].tolist() == [5, 6, 7, 8]


def test_sequence_model_learns_deterministic_transitions(tmp_path):
    # Markov chain: aid i is always followed by (i+1) % 20
    rng = np.random.default_rng(0)
    S, L, N = 800, 6, 20
    starts = rng.integers(0, N, S)
    sess = np.repeat(np.arange(S), L)
    aid = ((starts[:, None] + np.arange(L)[None, :]) % N).reshape(-1)
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))

    cfg = SequenceModelConfig(n_aids=N, dim=16, hidden=32, max_len=5, batch_size=1024,
                              epochs=20, n_negatives=10, learning_rate=5e-3)
    model = train_sequence_model(es, cfg)
    assert model.history[-1]["loss"] < model.history[0]["loss"]

    # predict next for held-out sessions: top-1 should be (last + 1) % N often
    test = es.select_sessions(np.arange(0, 50))
    top = model.full_sort_topk(test, k=3)
    last = test.last_aid()
    hit = np.mean([(l + 1) % N in top[i] for i, l in enumerate(last)])
    assert hit > 0.8, hit

    model.save(tmp_path / "seq.npz")
    loaded = SequenceModel.load(tmp_path / "seq.npz", cfg)
    top2 = loaded.full_sort_topk(test, k=3)
    np.testing.assert_array_equal(top, top2)


def test_transformer_learns_deterministic_transitions(tmp_path):
    # same Markov corpus, SASRec-style causal-transformer architecture
    rng = np.random.default_rng(1)
    S, L, N = 800, 6, 20
    starts = rng.integers(0, N, S)
    sess = np.repeat(np.arange(S), L)
    aid = ((starts[:, None] + np.arange(L)[None, :]) % N).reshape(-1)
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))

    cfg = SequenceModelConfig(n_aids=N, dim=16, hidden=0, max_len=5, batch_size=1024,
                              epochs=20, n_negatives=10, learning_rate=5e-3,
                              architecture="transformer", n_layers=2, n_heads=2)
    model = train_sequence_model(es, cfg)
    assert model.history[-1]["loss"] < model.history[0]["loss"]

    test = es.select_sessions(np.arange(0, 50))
    top = model.full_sort_topk(test, k=3)
    last = test.last_aid()
    hit = np.mean([(l + 1) % N in top[i] for i, l in enumerate(last)])
    assert hit > 0.8, hit

    model.save(tmp_path / "sas.npz")
    loaded = SequenceModel.load(tmp_path / "sas.npz", cfg)
    np.testing.assert_array_equal(top, loaded.full_sort_topk(test, k=3))


def test_transformer_causality():
    # changing a future event must not change the encoding at earlier positions'
    # session vector when the changed position is masked out
    import jax
    import jax.numpy as jnp

    from otto_tpu.models.sequence import encode, init_params

    p = init_params(jax.random.PRNGKey(0), 30, 16, 0, architecture="transformer",
                    max_len=8, n_layers=2, n_heads=2)
    seq = np.array([[1, 2, 3, 4, 0, 0, 0, 0]], np.int32)
    mask = np.array([[1, 1, 1, 1, 0, 0, 0, 0]], bool)
    h1 = np.asarray(encode(p, jnp.asarray(seq), jnp.asarray(mask)))
    seq2 = seq.copy()
    seq2[0, 5] = 17  # padded position: must not affect the session vector
    h2 = np.asarray(encode(p, jnp.asarray(seq2), jnp.asarray(mask)))
    np.testing.assert_allclose(h1, h2, atol=1e-6)


def test_moe_transformer_learns_deterministic_transitions(tmp_path):
    # moe_experts > 0 swaps every FFN for a top-1-gated mixture of experts
    # (ops/moe.py); the family must still learn the cyclic-successor rule and
    # round-trip through save/load
    rng = np.random.default_rng(2)
    S, L, N = 800, 6, 20
    starts = rng.integers(0, N, S)
    sess = np.repeat(np.arange(S), L)
    aid = ((starts[:, None] + np.arange(L)[None, :]) % N).reshape(-1)
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))

    cfg = SequenceModelConfig(n_aids=N, dim=16, hidden=0, max_len=5, batch_size=1024,
                              epochs=20, n_negatives=10, learning_rate=5e-3,
                              architecture="transformer", n_layers=2, n_heads=2,
                              moe_experts=4)
    model = train_sequence_model(es, cfg)
    assert model.history[-1]["loss"] < model.history[0]["loss"]

    test = es.select_sessions(np.arange(0, 50))
    top = model.full_sort_topk(test, k=3)
    last = test.last_aid()
    hit = np.mean([(l + 1) % N in top[i] for i, l in enumerate(last)])
    assert hit > 0.8, hit

    model.save(tmp_path / "moe.npz")
    loaded = SequenceModel.load(tmp_path / "moe.npz", cfg)
    np.testing.assert_array_equal(top, loaded.full_sort_topk(test, k=3))


def test_tiny_dataset_trains():
    # regression: datasets smaller than batch_size/2 used to crash the
    # batch-wrap (single-copy pad) with a shape mismatch
    rng = np.random.default_rng(4)
    S, L, N = 20, 4, 10
    sess = np.repeat(np.arange(S), L)
    aid = rng.integers(0, N, S * L)
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))
    cfg = SequenceModelConfig(n_aids=N, dim=8, hidden=8, max_len=4, batch_size=256,
                              epochs=2, n_negatives=4)
    model = train_sequence_model(es, cfg)
    assert np.isfinite(model.history[-1]["loss"])


def test_narm_learns_deterministic_transitions(tmp_path):
    rng = np.random.default_rng(3)
    S, L, N = 800, 6, 20
    starts = rng.integers(0, N, S)
    sess = np.repeat(np.arange(S), L)
    aid = ((starts[:, None] + np.arange(L)[None, :]) % N).reshape(-1)
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))

    cfg = SequenceModelConfig(n_aids=N, dim=16, hidden=32, max_len=5, batch_size=1024,
                              epochs=20, n_negatives=10, learning_rate=5e-3,
                              architecture="narm")
    model = train_sequence_model(es, cfg)
    assert model.history[-1]["loss"] < model.history[0]["loss"]
    test = es.select_sessions(np.arange(0, 50))
    top = model.full_sort_topk(test, k=3)
    last = test.last_aid()
    hit = np.mean([(l + 1) % N in top[i] for i, l in enumerate(last)])
    assert hit > 0.8, hit
    # round-trip preserves the attention parameters
    model.save(tmp_path / "narm.npz")
    loaded = SequenceModel.load(tmp_path / "narm.npz", cfg)
    np.testing.assert_array_equal(top, loaded.full_sort_topk(test, k=3))


def test_bpr_max_gru4rec_plus_learns(tmp_path):
    rng = np.random.default_rng(4)
    S, L, N = 800, 6, 20
    starts = rng.integers(0, N, S)
    sess = np.repeat(np.arange(S), L)
    aid = ((starts[:, None] + np.arange(L)[None, :]) % N).reshape(-1)
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))

    cfg = SequenceModelConfig(n_aids=N, dim=16, hidden=32, max_len=5, batch_size=1024,
                              epochs=20, n_negatives=10, learning_rate=5e-3,
                              loss="bpr_max", bpr_reg=1.0)
    model = train_sequence_model(es, cfg)
    assert model.history[-1]["loss"] < model.history[0]["loss"]
    test = es.select_sessions(np.arange(0, 50))
    top = model.full_sort_topk(test, k=3)
    last = test.last_aid()
    hit = np.mean([(l + 1) % N in top[i] for i, l in enumerate(last)])
    assert hit > 0.8, hit


def test_stamp_learns_deterministic_transitions(tmp_path):
    rng = np.random.default_rng(5)
    S, L, N = 800, 6, 20
    starts = rng.integers(0, N, S)
    sess = np.repeat(np.arange(S), L)
    aid = ((starts[:, None] + np.arange(L)[None, :]) % N).reshape(-1)
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))

    cfg = SequenceModelConfig(n_aids=N, dim=16, hidden=0, max_len=5, batch_size=1024,
                              epochs=25, n_negatives=10, learning_rate=5e-3,
                              architecture="stamp")
    model = train_sequence_model(es, cfg)
    assert model.history[-1]["loss"] < model.history[0]["loss"]
    test = es.select_sessions(np.arange(0, 50))
    top = model.full_sort_topk(test, k=3)
    last = test.last_aid()
    hit = np.mean([(l + 1) % N in top[i] for i, l in enumerate(last)])
    assert hit > 0.8, hit
    model.save(tmp_path / "stamp.npz")
    loaded = SequenceModel.load(tmp_path / "stamp.npz", cfg)
    np.testing.assert_array_equal(top, loaded.full_sort_topk(test, k=3))


def test_caser_learns_deterministic_transitions(tmp_path):
    rng = np.random.default_rng(6)
    S, L, N = 800, 6, 20
    starts = rng.integers(0, N, S)
    sess = np.repeat(np.arange(S), L)
    aid = ((starts[:, None] + np.arange(L)[None, :]) % N).reshape(-1)
    es = EventStore.from_flat(sess, aid, np.tile(np.arange(L), S), np.zeros(S * L, np.int8))

    cfg = SequenceModelConfig(n_aids=N, dim=16, hidden=32, max_len=5, batch_size=1024,
                              epochs=25, n_negatives=10, learning_rate=5e-3,
                              architecture="caser")
    model = train_sequence_model(es, cfg)
    assert model.history[-1]["loss"] < model.history[0]["loss"]
    test = es.select_sessions(np.arange(0, 50))
    top = model.full_sort_topk(test, k=3)
    last = test.last_aid()
    hit = np.mean([(l + 1) % N in top[i] for i, l in enumerate(last)])
    assert hit > 0.8, hit
    model.save(tmp_path / "caser.npz")
    loaded = SequenceModel.load(tmp_path / "caser.npz", cfg)
    np.testing.assert_array_equal(top, loaded.full_sort_topk(test, k=3))
