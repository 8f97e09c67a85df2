"""JSONL ingest tests: native parser vs python fallback vs expected content."""

import json

import numpy as np
import pytest

from otto_tpu.data.ingest import _parse_native, _parse_python, read_jsonl


@pytest.fixture
def jsonl_file(tmp_path):
    rows = [
        {"session": 10, "events": [
            {"aid": 100, "ts": 1661724000123, "type": "clicks"},
            {"aid": 200, "ts": 1661724060456, "type": "carts"},
        ]},
        {"session": 11, "events": [
            {"aid": 300, "ts": 1661724120789, "type": "orders"},
        ]},
        {"session": 12, "events": []},
    ]
    p = tmp_path / "events.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return p


def test_python_parser(jsonl_file):
    session, aid, ts, typ = _parse_python(jsonl_file)
    np.testing.assert_array_equal(session, [10, 10, 11])
    np.testing.assert_array_equal(aid, [100, 200, 300])
    np.testing.assert_array_equal(typ, [0, 1, 2])
    assert ts[0] == 1661724000123


def test_native_parser_matches_python(jsonl_file):
    native = _parse_native(jsonl_file)
    assert native is not None, "native parser failed to build"
    py = _parse_python(jsonl_file)
    for a, b in zip(native, py):
        np.testing.assert_array_equal(a, b)


def test_native_parser_key_order_robust(tmp_path):
    p = tmp_path / "reordered.jsonl"
    with open(p, "w") as f:
        f.write('{"events": [{"ts": 5000, "type": "carts", "aid": 7}], "session": 3}\n')
    native = _parse_native(p)
    assert native is not None
    session, aid, ts, typ = native
    assert list(session) == [3]
    assert list(aid) == [7]
    assert list(ts) == [5000]
    assert list(typ) == [1]


def test_read_jsonl_store(jsonl_file):
    es = read_jsonl(jsonl_file, ts_unit="ms")
    assert es.n_events == 3
    assert es.n_sessions == 2  # empty session dropped
    assert es.ts[0] == 1661724000  # ms -> s


def test_native_parser_scales(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "big.jsonl"
    n_sessions = 2000
    expected_events = 0
    with open(p, "w") as f:
        for s in range(n_sessions):
            n = int(rng.integers(1, 20))
            events = [
                {"aid": int(rng.integers(0, 10000)), "ts": int(1e12 + i), "type": ["clicks", "carts", "orders"][int(rng.integers(0, 3))]}
                for i in range(n)
            ]
            expected_events += n
            f.write(json.dumps({"session": s, "events": events}) + "\n")
    native = _parse_native(p)
    py = _parse_python(p)
    assert len(native[0]) == expected_events
    for a, b in zip(native, py):
        np.testing.assert_array_equal(a, b)


def test_native_submission_writer_matches_python(tmp_path):
    """The C++ gzip writer's output parses identically to the Python
    fallback's (concatenated gzip members are a valid gzip stream)."""
    import numpy as np

    import otto_tpu.data.submission as sub

    rng = np.random.default_rng(0)
    S = 500
    sids = np.arange(12899779, 12899779 + S, dtype=np.int64)
    preds = {
        t: np.where(rng.random((S, 20)) < 0.15, -1,
                    rng.integers(0, 1_855_604, (S, 20))).astype(np.int32)
        for t in ("clicks", "carts", "orders")
    }
    sub.write_submission(tmp_path / "n.csv.gz", sids, preds)
    native_available = sub._lib is not False
    sub._lib = False
    try:
        sub.write_submission(tmp_path / "p.csv.gz", sids, preds)
    finally:
        sub._lib = None
    a = sub.read_submission(tmp_path / "n.csv.gz")
    b = sub.read_submission(tmp_path / "p.csv.gz")
    assert a == b
    assert native_available, "native writer failed to build in this environment"


def test_batch_loader_prefetch_and_order(rng):
    """BatchLoader (the Merlin-dataloader replacement): fixed-shape device
    batches in the given order, wrap-padded remainder, clean early stop."""
    import jax.numpy as jnp
    from otto_tpu.data.loader import BatchLoader

    x = np.arange(10, dtype=np.int32)
    y = np.arange(10, dtype=np.float32) * 2
    order = rng.permutation(10)
    batches = list(BatchLoader((x, y), 4, order=order, drop_remainder=False))
    assert len(batches) == 3
    got_x = np.concatenate([np.asarray(b[0]) for b in batches])
    # first 10 entries follow the permutation; remainder wraps to the front
    np.testing.assert_array_equal(got_x[:10], x[order])
    np.testing.assert_array_equal(got_x[10:], x[order[:2]])
    for bx, by in batches:
        assert bx.shape == (4,) and by.shape == (4,)
        np.testing.assert_allclose(np.asarray(by), np.asarray(bx) * 2.0)
    assert isinstance(batches[0][0], jnp.ndarray)

    # drop_remainder (the trainer default) drops the short tail
    assert len(list(BatchLoader((x, y), 4, order=order))) == 2

    # abandoning the iterator mid-stream must not hang
    loader = BatchLoader((np.arange(100), ), 5, prefetch=2)
    it = iter(loader)
    next(it)
    loader.close()


def test_batch_loader_length_mismatch():
    from otto_tpu.data.loader import BatchLoader

    with np.testing.assert_raises(ValueError):
        BatchLoader((np.arange(4), np.arange(5)), 2)
