"""Heuristic covisitation recommender vs a Python oracle restating the
reference algorithm (src/covisitation/inference.py:128-247) over the same
neighbor tables."""

from collections import Counter

import numpy as np
import pytest

from otto_tpu import EVENT_TYPES
from otto_tpu.config import CovisitConfig
from otto_tpu.data.synthetic import synthetic_events
from otto_tpu.models.covisitation import (
    RECENCY_TYPE_COEFF,
    build_covisitation,
    covisit_heuristic_predictions,
    session_unique_counts,
)
from otto_tpu.models.frequency import FrequencyStatistics


def oracle_predictions(store, tables, stats_top, narrow_k, k=20):
    """Reference heuristic, restated per session over dense tables."""

    def neigh(kind, aid):
        row = tables[kind][0][aid][:narrow_k]
        return [int(x) for x in row if x >= 0]

    S = store.n_sessions
    out = {t: [] for t in EVENT_TYPES}
    for s in range(S):
        lo, hi = store.offsets[s], store.offsets[s + 1]
        aids = store.aid[lo:hi].tolist()
        types = store.type[lo:hi].tolist()
        uniq = list(dict.fromkeys(aids[::-1]))
        u_click = np.unique(np.array(aids)[np.array(types) == 0]).tolist()
        u_clickcart = np.unique(np.array(aids)[np.array(types) <= 1]).tolist()
        u_cartorder = np.unique(np.array(aids)[np.array(types) >= 1]).tolist()

        if len(set(aids)) >= 20:
            # recency route
            w_click = np.logspace(0.1, 1, len(aids), base=2, endpoint=True) - 1
            w_co = np.logspace(0.5, 1, len(aids), base=2, endpoint=True) - 1
            cl, ca, orr = Counter(), Counter(), Counter()
            for a, t, wc, wo in zip(aids, types, w_click, w_co):
                cl[a] += wc * RECENCY_TYPE_COEFF[t]
                ca[a] += wo * RECENCY_TYPE_COEFF[t]
                orr[a] += wo * RECENCY_TYPE_COEFF[t]
            for a in (x for q in u_click for x in neigh("time_weighted", q)):
                cl[a] += 0.05
            for a in (x for q in u_clickcart for x in neigh("cart_weighted", q)):
                ca[a] += 0.05
            for a in (x for q in u_cartorder for x in neigh("cart_order", q)):
                orr[a] += 0.15
            out["clicks"].append([a for a, _ in cl.most_common(k)])
            out["carts"].append([a for a, _ in ca.most_common(k)])
            out["orders"].append([a for a, _ in orr.most_common(k)])
        else:
            # covisitation route
            time_l = [x for q in uniq for x in neigh("time_weighted", q)]
            clickw_l = [x for q in u_clickcart for x in neigh("click_weighted", q)]
            cartw_l = [x for q in u_clickcart for x in neigh("cart_weighted", q)]
            clickcart_l = [x for q in u_clickcart for x in neigh("click_cart", q)]
            cartorder_l = [x for q in u_clickcart for x in neigh("cart_order", q)]

            def pick(concat, fill):
                top = [a for a, _ in Counter(concat).most_common(k) if a not in uniq]
                preds = uniq + top[: k - len(uniq)]
                preds = preds + [int(x) for x in fill[: k - len(preds)]]
                return preds

            out["clicks"].append(
                pick(time_l + clickw_l + cartw_l + clickcart_l + cartorder_l, stats_top["clicks"])
            )
            out["carts"].append(pick(time_l + cartw_l + cartorder_l, stats_top["carts"]))
            out["orders"].append(pick(time_l + cartw_l + cartorder_l, stats_top["orders"]))
    return out


@pytest.fixture(scope="module")
def setup():
    es = synthetic_events(n_sessions=300, n_aids=250, mean_length=14, seed=41)
    cfg = CovisitConfig(top_k_wide=20, session_tail=30)
    mats = build_covisitation(es, n_aids=250, config=cfg, chunk_sessions=128)
    stats = FrequencyStatistics.compute(es, n_aids=250, k=20)
    stats_top = {t: stats.top_by_type[t] for t in EVENT_TYPES}
    return es, mats, stats_top


def test_heuristic_matches_oracle(setup):
    es, mats, stats_top = setup
    preds = covisit_heuristic_predictions(
        es, mats, stats_top, narrow_k=15, chunk_sessions=64
    )
    oracle = oracle_predictions(es, mats.tables, stats_top, narrow_k=15)
    counts = session_unique_counts(es)
    mismatches = {t: 0 for t in EVENT_TYPES}
    for t in EVENT_TYPES:
        for s in range(es.n_sessions):
            got = [int(a) for a in preds[t][s] if a >= 0]
            exp = oracle[t][s]
            if got != exp:
                # float tie reordering is tolerable; sets must agree
                if set(got) != set(exp):
                    mismatches[t] += 1
    assert all(v == 0 for v in mismatches.values()), mismatches


def test_exact_order_covisit_route(setup):
    """Integer-vote route must match ordering exactly (no float ties)."""
    es, mats, stats_top = setup
    preds = covisit_heuristic_predictions(es, mats, stats_top, narrow_k=15)
    oracle = oracle_predictions(es, mats.tables, stats_top, narrow_k=15)
    counts = session_unique_counts(es)
    for t in EVENT_TYPES:
        for s in np.flatnonzero(counts < 20):
            got = [int(a) for a in preds[t][s] if a >= 0]
            assert got == oracle[t][s], (t, s, got, oracle[t][s])


def test_unique_counts(setup):
    es, _, _ = setup
    counts = session_unique_counts(es)
    for s in range(50):
        lo, hi = es.offsets[s], es.offsets[s + 1]
        assert counts[s] == len(set(es.aid[lo:hi].tolist()))


def test_fasttext_bonus_uses_true_last_aid():
    """Regression: short sessions are left-aligned in the packed layout, so
    the last aid lives at column len-1 (NOT column -1, which is padding aid
    0).  The fastText neighbor bonus must query the true last aid."""
    from otto_tpu.data.events import EventStore

    # one session [7, 8, 9]; n_aids small
    es = EventStore.from_flat(
        np.array([1, 1, 1]), np.array([7, 8, 9]), np.arange(3), np.zeros(3, np.int8)
    )
    tables = build_covisitation(es, 64, CovisitConfig(top_k_wide=8, top_k_narrow=8))
    # neighbor table: aid 9 -> 42, aid 0 -> 13
    ft = np.full((64, 1), -1, np.int32)
    ft[9, 0] = 42
    ft[0, 0] = 13
    stats = {t: np.zeros(20, np.int32) for t in EVENT_TYPES}
    preds = covisit_heuristic_predictions(
        es, tables, stats, ft_neighbors=ft, max_len=8, chunk_sessions=4
    )
    for t in EVENT_TYPES:
        row = preds[t][0].tolist()
        assert 42 in row, (t, row)
        assert 13 not in row, (t, row)
