import numpy as np

from otto_tpu.data.events import EventStore
from otto_tpu.data.synthetic import synthetic_events


def test_from_flat_sorts_and_builds_csr():
    session = np.array([5, 3, 5, 3, 9])
    aid = np.array([10, 20, 30, 40, 50])
    ts = np.array([100, 7, 50, 8, 1])
    typ = np.array([0, 0, 1, 2, 0])
    es = EventStore.from_flat(session, aid, ts, typ)
    assert es.n_sessions == 3
    assert list(es.session_ids) == [3, 5, 9]
    # session 3 events sorted by ts: (20,7), (40,8)
    assert list(es.aid[es.offsets[0] : es.offsets[1]]) == [20, 40]
    # session 5 sorted by ts: (30,50), (10,100)
    assert list(es.aid[es.offsets[1] : es.offsets[2]]) == [30, 10]
    assert list(es.lengths) == [2, 2, 1]
    assert list(es.position_in_session) == [0, 1, 0, 1, 0]
    assert list(es.last_aid()) == [40, 10, 50]


def test_select_and_between():
    es = synthetic_events(n_sessions=50, n_aids=100, seed=1)
    sub = es.sessions_between(lo=10, hi=30)
    assert np.all((sub.session_ids >= 10) & (sub.session_ids < 30))
    total = es.sessions_between(hi=10).n_events + sub.n_events + es.sessions_between(lo=30).n_events
    assert total == es.n_events


def test_truncate_and_tail():
    es = synthetic_events(n_sessions=40, n_aids=100, seed=2)
    cut = np.minimum(es.lengths - 1, 2).astype(np.int64)
    head = es.truncate(cut)
    assert np.all(head.lengths == np.minimum(es.lengths, 3))
    tail_sessions = es.lengths > 3
    tail = es.tail_after(cut)
    assert tail.n_sessions == tail_sessions.sum()
    assert head.n_events + tail.n_events == es.n_events


def test_pack_last_and_first():
    session = np.array([1, 1, 1, 1, 2])
    aid = np.array([11, 12, 13, 14, 21])
    ts = np.arange(5)
    typ = np.zeros(5, dtype=np.int8)
    es = EventStore.from_flat(session, aid, ts, typ)
    packed = es.pack(max_len=3, keep="last")
    assert packed.aids.shape == (2, 3)
    assert list(packed.aids[0]) == [12, 13, 14]  # last 3 events
    assert list(packed.mask[0]) == [True, True, True]
    assert list(packed.aids[1]) == [21, 0, 0]
    assert list(packed.mask[1]) == [True, False, False]
    assert list(packed.lengths) == [4, 1]

    packed_f = es.pack(max_len=3, keep="first")
    assert list(packed_f.aids[0]) == [11, 12, 13]


def test_pack_roundtrip_wide():
    es = synthetic_events(n_sessions=100, n_aids=200, seed=3)
    L = int(es.lengths.max())
    packed = es.pack(max_len=L, keep="last")
    assert packed.mask.sum() == es.n_events
    # per-session last aid preserved
    last_col = np.minimum(es.lengths, L) - 1
    np.testing.assert_array_equal(
        packed.aids[np.arange(es.n_sessions), last_col], es.last_aid()
    )


def test_parquet_roundtrip(tmp_path):
    es = synthetic_events(n_sessions=30, n_aids=50, seed=4)
    p = tmp_path / "events.parquet"
    es.to_parquet(p)
    es2 = EventStore.from_parquet(p)
    np.testing.assert_array_equal(es.aid, es2.aid)
    np.testing.assert_array_equal(es.ts, es2.ts)
    np.testing.assert_array_equal(es.session_ids, es2.session_ids)


def test_length_buckets():
    es = synthetic_events(n_sessions=200, n_aids=100, seed=5)
    groups = es.length_buckets(edges=(4, 16, 64))
    counts = sum(len(g) for g in groups)
    assert counts == es.n_sessions
