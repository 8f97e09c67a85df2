"""Framework-vs-oracle measured parity (small scale).

The oracle (`otto_tpu.eval.oracle`) literally restates the reference's
heuristic recommender and production candidate generator with Counter/list
semantics; these tests feed both sides identical covisitation tables,
frequency statistics, and kNN neighbor lists, then require near-exact
agreement of the emitted prediction lists (ties between equal float weights
may legally resolve differently across f32/f64 summation orders, so the bar
is a high exact-match fraction plus recall equality, not 100% list identity).

The realistic-scale version of this comparison is ``tools/parity_run.py``
(VERDICT.md round-1 item 1); its numbers live in REPORT.md.
"""

import numpy as np
import pytest

from otto_tpu import EVENT_TYPES
from otto_tpu.data.splits import split_by_time
from otto_tpu.data.synthetic import synthetic_events_v2
from otto_tpu.eval.oracle import (
    labels_to_lists,
    neighbor_lists,
    oracle_heuristic,
    oracle_regular_candidates,
    store_to_lists,
    table_to_dict,
    weighted_corpus_recall,
)
from otto_tpu.models.candidates import regular_candidates
from otto_tpu.models.covisitation import build_covisitation, covisit_heuristic_predictions
from otto_tpu.models.frequency import FrequencyStatistics

N_AIDS = 900


@pytest.fixture(scope="module")
def parity_setup():
    store = synthetic_events_v2(
        n_sessions=3000, n_aids=N_AIDS, mean_length=13.0, n_clusters=40, seed=11
    )
    split = split_by_time(store, val_fraction=0.25, seed=3)
    mats = build_covisitation(split.train, N_AIDS, chunk_sessions=512)
    stats = FrequencyStatistics.compute(split.train, n_aids=N_AIDS)
    rng = np.random.default_rng(5)
    # deterministic shared kNN table: 45 distinct non-self neighbors per aid
    base = np.argsort(rng.random((N_AIDS, N_AIDS)), axis=1)[:, :46]
    ft45 = np.empty((N_AIDS, 45), np.int32)
    for a in range(N_AIDS):
        row = [x for x in base[a] if x != a][:45]
        ft45[a] = row
    return store, split, mats, stats, ft45


def _rows_to_lists(arr):
    return [[int(x) for x in row if x >= 0] for row in arr]


def _match_stats(framework_rows, oracle_rows):
    exact = sum(f == o for f, o in zip(framework_rows, oracle_rows))
    setm = sum(set(f) == set(o) for f, o in zip(framework_rows, oracle_rows))
    return exact / len(oracle_rows), setm / len(oracle_rows)


def test_heuristic_parity(parity_setup):
    _, split, mats, stats, ft45 = parity_setup
    stats_top = {t: stats.top_by_type[t] for t in EVENT_TYPES}
    preds = covisit_heuristic_predictions(
        split.val_input, mats, stats_top, ft_neighbors=ft45, chunk_sessions=512
    )

    aid_lists, type_lists = store_to_lists(split.val_input)
    tables = {k: table_to_dict(mats.tables[k][0], 15) for k in mats.tables}
    freq = {t: [int(a) for a in stats.top_by_type[t]] for t in EVENT_TYPES}
    oracle = oracle_heuristic(aid_lists, type_lists, tables, freq, neighbor_lists(ft45))

    lab = labels_to_lists(split.val_labels)
    r_o = weighted_corpus_recall(oracle, lab)
    r_f = weighted_corpus_recall({t: _rows_to_lists(preds[t]) for t in EVENT_TYPES}, lab)
    for t in EVENT_TYPES:
        exact, setm = _match_stats(_rows_to_lists(preds[t]), oracle[t])
        assert exact >= 0.97, f"{t}: exact-match {exact:.4f}"
        assert setm >= 0.98, f"{t}: set-match {setm:.4f}"
    assert abs(r_f["weighted"] - r_o["weighted"]) < 2e-3, (r_f, r_o)


def test_regular_candidates_parity(parity_setup):
    _, split, mats, _, ft45 = parity_setup
    ft20 = ft45[:, :20]
    cs = regular_candidates(
        split.val_input, mats, ft_neighbors=ft20, wide_k=20, chunk_sessions=512
    )

    aid_lists, type_lists = store_to_lists(split.val_input)
    tables = {k: table_to_dict(mats.tables[k][0], 20) for k in mats.tables}
    oracle = oracle_regular_candidates(aid_lists, type_lists, tables, neighbor_lists(ft20))

    # exact comparison only where the framework's static caps are not binding
    # (uniq_cap=64 history aids, vote_cap=32 vote-source aids)
    n_uniq = np.array([len(set(a)) for a in aid_lists])
    ok = n_uniq <= 32
    for t in EVENT_TYPES:
        f_rows = _rows_to_lists(cs.candidates[t])
        f_scores = [
            [float(x) for x, c in zip(srow, crow) if c >= 0]
            for srow, crow in zip(cs.scores[t], cs.candidates[t])
        ]
        o_rows, o_scores = oracle[t]
        idx = np.flatnonzero(ok)
        exact = np.mean([f_rows[i] == o_rows[i] for i in idx])
        assert exact >= 0.97, f"{t}: candidate exact-match {exact:.4f}"
        score_ok = np.mean(
            [np.allclose(f_scores[i], o_scores[i], atol=1e-4) for i in idx if f_rows[i] == o_rows[i]]
        )
        assert score_ok >= 0.99, f"{t}: score agreement {score_ok:.4f}"


def test_recency_route_host_f64_exact(parity_setup):
    """The float64 host accumulator must reproduce the oracle's recency-route
    lists exactly (the f32 device route's only parity gap is tie-break drift
    on this route — VERDICT r2 weak #5)."""
    _, split, mats, stats, ft45 = parity_setup
    stats_top = {t: stats.top_by_type[t] for t in EVENT_TYPES}
    preds = covisit_heuristic_predictions(
        split.val_input, mats, stats_top, ft_neighbors=ft45, chunk_sessions=512,
        recency_host_f64=True,
    )

    aid_lists, type_lists = store_to_lists(split.val_input)
    tables = {k: table_to_dict(mats.tables[k][0], 15) for k in mats.tables}
    freq = {t: [int(a) for a in stats.top_by_type[t]] for t in EVENT_TYPES}
    oracle = oracle_heuristic(aid_lists, type_lists, tables, freq, neighbor_lists(ft45))

    rec = np.array([len(set(a)) >= 20 for a in aid_lists])
    assert rec.any(), "fixture must contain recency-route sessions"
    idx = np.flatnonzero(rec)
    for t in EVENT_TYPES:
        f_rows = _rows_to_lists(preds[t])
        exact = np.mean([f_rows[i] == oracle[t][i] for i in idx])
        assert exact >= 0.999, f"{t}: recency-route exact-match {exact:.4f}"


def test_covisit_route_host_exact(parity_setup):
    """The host-vectorized covisit-vote route must reproduce the oracle's
    lists exactly (unit votes are integer counts — no float ties)."""
    _, split, mats, stats, ft45 = parity_setup
    from otto_tpu.models.heuristic_host import covisit_route_host
    from otto_tpu.models.covisitation import session_unique_counts

    narrow = {k: np.asarray(mats.tables[k][0][:, :15]) for k in mats.tables}
    freq = {t: stats.top_by_type[t] for t in EVENT_TYPES}
    counts = session_unique_counts(split.val_input)
    cov_idx = np.flatnonzero(counts < 20)
    preds = covisit_route_host(split.val_input, cov_idx, narrow, freq, ft45)

    aid_lists, type_lists = store_to_lists(split.val_input)
    tables = {k: table_to_dict(mats.tables[k][0], 15) for k in mats.tables}
    freq_l = {t: [int(a) for a in stats.top_by_type[t]] for t in EVENT_TYPES}
    oracle = oracle_heuristic(aid_lists, type_lists, tables, freq_l, neighbor_lists(ft45))

    for t in EVENT_TYPES:
        f_rows = _rows_to_lists(preds[t])
        exact = np.mean([f_rows[j] == oracle[t][i] for j, i in enumerate(cov_idx)])
        assert exact >= 0.999, f"{t}: covisit-route host exact-match {exact:.4f}"
