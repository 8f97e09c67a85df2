"""Feature-engineering tests vs hand-computed/pandas-free oracles."""

import numpy as np
import pytest

from otto_tpu.data.events import EventStore
from otto_tpu.data.synthetic import synthetic_events
from otto_tpu.features import (
    RANKER_FEATURES,
    assemble_features,
    compute_aid_features,
    compute_interaction_features,
    compute_session_features,
)
from otto_tpu.features.base import calendar, rank_pct, seg_nunique, seg_std


def test_calendar_matches_datetime():
    ts = np.array([1_659_304_800, 1_661_000_000, 0], np.int64)
    cal = calendar(ts)
    import datetime

    for i, t in enumerate(ts):
        dt = datetime.datetime.fromtimestamp(int(t) + 7200, datetime.UTC)
        assert cal["hour"][i] == dt.hour
        assert cal["day_of_week"][i] == dt.weekday()
        assert cal["day_of_year"][i] == dt.timetuple().tm_yday
        assert cal["week_of_year"][i] == dt.isocalendar()[1]


def test_rank_pct_matches_pandas_semantics():
    v = np.array([10.0, 20.0, 20.0, np.nan, 5.0])
    r = rank_pct(v)
    # pandas: ranks among non-nan = [2, 3.5, 3.5, nan, 1] / 4
    np.testing.assert_allclose(r[[0, 1, 2, 4]], [0.5, 0.875, 0.875, 0.25])
    assert np.isnan(r[3])


def test_seg_std_ddof1():
    ids = np.array([0, 0, 0, 1])
    vals = np.array([1.0, 2.0, 3.0, 5.0])
    out = seg_std(ids, vals, 2)
    assert out[0] == pytest.approx(1.0)
    assert np.isnan(out[1])  # single-element group


def test_seg_nunique():
    ids = np.array([0, 0, 0, 1, 1])
    vals = np.array([7, 7, 8, 9, 9])
    np.testing.assert_array_equal(seg_nunique(ids, vals, 3), [2, 1, 0])


@pytest.fixture(scope="module")
def store():
    return synthetic_events(n_sessions=200, n_aids=150, mean_length=10, seed=81)


def test_aid_features_basics(store):
    f = compute_aid_features(store, n_aids=150)
    counts = np.bincount(store.aid, minlength=150)
    np.testing.assert_array_equal(f["aid_count"], counts)
    # click + cart + order counts sum to total where present
    total = (
        np.nan_to_num(f["aid_click_count"])
        + np.nan_to_num(f["aid_cart_count"])
        + np.nan_to_num(f["aid_order_count"])
    )
    np.testing.assert_allclose(total, counts, rtol=1e-6)
    # type mean within [0, 2]
    tm = f["aid_type_mean"][counts > 0]
    assert np.all((tm >= 0) & (tm <= 2))
    # ratio features sum to 1 where present
    rsum = (
        np.nan_to_num(f["aid_click_ratio"])
        + np.nan_to_num(f["aid_cart_ratio"])
        + np.nan_to_num(f["aid_order_ratio"])
    )[counts > 0]
    np.testing.assert_allclose(rsum, 1.0, rtol=1e-5)
    # occurrence ratio in [0, 1]
    for name in ("click", "cart", "order"):
        r = f[f"aid_{name}_last_week_occurrence_ratio"]
        assert np.all((r >= 0) & (r <= 1))


def test_aid_features_oracle_one_aid(store):
    f = compute_aid_features(store, n_aids=150)
    a = int(np.argmax(np.bincount(store.aid)))  # most frequent aid
    m = store.aid == a
    cal = calendar(store.ts)
    assert f["aid_count"][a] == m.sum()
    assert f["aid_hour_mean"][a] == pytest.approx(cal["hour"][m].mean(), rel=1e-5)
    assert f["aid_session_nunique_rank_pct"][a] <= 1.0
    assert f["aid_ts_ratio"][a] == pytest.approx(
        store.ts[m].max() / store.ts[m].min(), rel=1e-6
    )


def test_session_features_oracle(store):
    aidf = compute_aid_features(store, n_aids=150)
    sf = compute_session_features(store, aidf)
    s = 3
    lo, hi = store.offsets[s], store.offsets[s + 1]
    assert sf["session_count"][s] == hi - lo
    assert sf["session_aid_nunique"][s] == len(set(store.aid[lo:hi].tolist()))
    assert sf["session_aid_last"][s] == store.aid[hi - 1]
    assert sf["session_type_last"][s] == store.type[hi - 1]
    expected_mean = np.mean([aidf["aid_count"][a] for a in store.aid[lo:hi]])
    assert sf["session_aid_count_mean"][s] == pytest.approx(expected_mean, rel=1e-5)
    n_clicks = (store.type[lo:hi] == 0).sum()
    assert sf["session_click_count"][s] == n_clicks
    assert sf["session_click_ratio"][s] == pytest.approx(n_clicks / (hi - lo), rel=1e-6)


def test_interaction_features_oracle(store):
    rng = np.random.default_rng(0)
    S, C = store.n_sessions, 8
    # half the candidates are real session aids, half random
    cands = np.full((S, C), -1, np.int32)
    scores = rng.random((S, C)).astype(np.float32)
    for s in range(S):
        lo, hi = store.offsets[s], store.offsets[s + 1]
        own = store.aid[lo:hi][: C // 2]
        cands[s, : len(own)] = own
        cands[s, C // 2 :] = rng.integers(0, 150, C // 2)
    f = compute_interaction_features(store, cands, scores, n_aids=150)

    for s in range(0, S, 17):
        lo, hi = store.offsets[s], store.offsets[s + 1]
        sess_aids = store.aid[lo:hi].tolist()
        for c in range(C):
            a = cands[s, c]
            if a < 0:
                continue
            occ = sess_aids.count(int(a))
            assert f["session_candidate_occurrence_count"][s, c] == occ
            if occ:
                last_pos = max(i for i, x in enumerate(sess_aids) if x == a) + 1
                assert f["session_candidate_cumcount_last"][s, c] == last_pos
            clicks = sum(
                1 for i, x in enumerate(sess_aids) if x == a and store.type[lo + i] == 0
            )
            assert f["session_candidate_click_occurrence_count"][s, c] == clicks
        valid = cands[s] >= 0
        assert f["session_candidate_score_mean"][s, valid][0] == pytest.approx(
            scores[s, valid].mean(), rel=1e-5
        )


def test_assemble_full_52(store):
    aidf = compute_aid_features(store, n_aids=150)
    sf = compute_session_features(store, aidf)
    rng = np.random.default_rng(1)
    S, C = store.n_sessions, 6
    cands = rng.integers(0, 150, (S, C)).astype(np.int32)
    cands[:, -1] = -1
    scores = rng.random((S, C)).astype(np.float32)
    inter = compute_interaction_features(store, cands, scores, n_aids=150)
    X = assemble_features(RANKER_FEATURES, inter, aidf, sf, cands)
    assert X.shape == (S, C, len(RANKER_FEATURES))
    # exact parity with models/lightgbm/config.yaml feature list (54 entries)
    assert len(RANKER_FEATURES) == 54


def test_block_stats_native_matches_numpy(store):
    """The fused C++ engine (native/segment_stats.cc) and the numpy fallback
    must produce identical block statistics, masked and unmasked."""
    from otto_tpu.features.base import _load_segstats, block_stats

    if not _load_segstats():
        import pytest

        pytest.skip("native segment_stats unavailable (no g++)")
    rng = np.random.default_rng(7)
    n_ev, n = len(store.aid), 150
    ids = store.aid.astype(np.int64)
    sess = store.session_idx.astype(np.int64)
    day = (rng.integers(1, 366, n_ev)).astype(np.int32)
    ts = store.ts.astype(np.float64)
    cols = np.ascontiguousarray(rng.normal(size=(3, n_ev)))
    for mask in (None, store.type == 1, np.zeros(n_ev, bool)):
        a = block_stats(ids, sess, day, ts, cols, n, mask=mask)
        b = block_stats(ids, sess, day, ts, cols, n, mask=mask, force_numpy=True)
        for x, y, name in zip(a, b, ("count", "sess_nu", "day_nu", "ts_min",
                                     "ts_max", "sums", "sumsqs")):
            np.testing.assert_allclose(x, y, rtol=1e-12, atol=1e-12,
                                       equal_nan=True, err_msg=name)


def test_aid_features_native_matches_numpy(store):
    f1 = compute_aid_features(store, n_aids=150)
    f2 = compute_aid_features(store, n_aids=150, force_numpy=True)
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_allclose(f1[k], f2[k], rtol=1e-5, atol=1e-6,
                                    equal_nan=True, err_msg=k)
