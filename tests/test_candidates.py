"""Candidate-generator parity vs Python oracles of the reference logic."""

from collections import Counter

import numpy as np
import pytest

from otto_tpu import EVENT_TYPES
from otto_tpu.config import CovisitConfig
from otto_tpu.data import splits, synthetic_events
from otto_tpu.models.candidates import (
    RECENCY_CANDGEN_COEFF,
    covisit_candidates,
    recency_candidates,
    regular_candidates,
)
from otto_tpu.models.covisitation import build_covisitation


@pytest.fixture(scope="module")
def setup():
    es = synthetic_events(n_sessions=500, n_aids=400, mean_length=10, seed=51)
    sp = splits.split_by_fraction(es, val_fraction=0.4)
    cfg = CovisitConfig(top_k_wide=20, session_tail=30)
    mats = build_covisitation(sp.train, n_aids=400, config=cfg, chunk_sessions=256)
    return sp, mats


def oracle_regular(store, tables, wide_k, k_covisit, uniq_cap):
    def neigh(kind, aid):
        row = tables[kind][0][aid][:wide_k]
        return [int(x) for x in row if x >= 0]

    out = {t: [] for t in EVENT_TYPES}
    for s in range(store.n_sessions):
        lo, hi = store.offsets[s], store.offsets[s + 1]
        aids = store.aid[lo:hi].tolist()
        types = store.type[lo:hi].tolist()
        uniq = list(dict.fromkeys(aids[::-1]))[:uniq_cap]
        u_cc = np.unique(np.array(aids)[np.array(types) <= 1]).tolist()[:uniq_cap]
        time_l = [x for q in uniq for x in neigh("time_weighted", q)]
        clickw_l = [x for q in u_cc for x in neigh("click_weighted", q)]
        cartw_l = [x for q in u_cc for x in neigh("cart_weighted", q)]
        clickcart_l = [x for q in u_cc for x in neigh("click_cart", q)]
        cartorder_l = [x for q in u_cc for x in neigh("cart_order", q)]
        concats = {
            "clicks": time_l + clickw_l + cartw_l + clickcart_l + cartorder_l,
            "carts": time_l + cartw_l + cartorder_l,
            "orders": time_l + cartw_l + cartorder_l,
        }
        for t in EVENT_TYPES:
            pairs = [
                (a, c) for a, c in Counter(concats[t]).most_common(k_covisit) if a not in uniq
            ]
            hist_scores = list(range(1, len(uniq) + 1))[::-1]
            cands = uniq + [a for a, _ in pairs]
            scores = hist_scores + [c for _, c in pairs]
            out[t].append((cands, scores))
    return out


def test_regular_matches_oracle(setup):
    sp, mats = setup
    cs = regular_candidates(
        sp.val_input, mats, labels=sp.val_labels, uniq_cap=32, wide_k=10,
        k_covisit=50, chunk_sessions=128,
    )
    oracle = oracle_regular(sp.val_input, mats.tables, wide_k=10, k_covisit=50, uniq_cap=32)
    for t in EVENT_TYPES:
        for s in range(sp.val_input.n_sessions):
            got_c = [int(a) for a in cs.candidates[t][s] if a >= 0]
            got_s = cs.scores[t][s][cs.candidates[t][s] >= 0].tolist()
            exp_c, exp_s = oracle[t][s]
            assert got_c == exp_c, (t, s, got_c[:10], exp_c[:10])
            np.testing.assert_allclose(got_s, exp_s, rtol=1e-5)


def test_regular_labels(setup):
    sp, mats = setup
    cs = regular_candidates(
        sp.val_input, mats, labels=sp.val_labels, uniq_cap=32, wide_k=10,
        k_covisit=50, chunk_sessions=128,
    )
    lab = sp.val_labels
    for s in range(0, sp.val_input.n_sessions, 7):
        carts = set(lab.cart_flat[lab.cart_offsets[s] : lab.cart_offsets[s + 1]].tolist())
        for c, l in zip(cs.candidates["carts"][s], cs.labels["carts"][s]):
            if c >= 0:
                assert bool(l) == (int(c) in carts)
        click = int(lab.click[s])
        for c, l in zip(cs.candidates["clicks"][s], cs.labels["clicks"][s]):
            if c >= 0:
                assert bool(l) == (click >= 0 and int(c) == click)


def test_max_recall_ceiling_ordering(setup):
    """Wider generators must have a ceiling >= narrower ones."""
    sp, mats = setup
    wide = regular_candidates(sp.val_input, mats, labels=sp.val_labels, uniq_cap=32,
                              wide_k=10, k_covisit=50, chunk_sessions=128)
    narrow = recency_candidates(sp.val_input, labels=sp.val_labels, uniq_cap=32,
                                chunk_sessions=128)
    r_wide = wide.max_recall_report(sp.val_labels)
    r_narrow = narrow.max_recall_report(sp.val_labels)
    assert r_wide["weighted"] >= r_narrow["weighted"] - 1e-9
    assert 0 < r_wide["weighted"] <= 1


def oracle_recency(store, uniq_cap):
    out = {t: [] for t in EVENT_TYPES}
    lo_exp = {"clicks": 0.1, "carts": 0.5, "orders": 0.5}
    for s in range(store.n_sessions):
        lo, hi = store.offsets[s], store.offsets[s + 1]
        aids = store.aid[lo:hi].tolist()
        types = store.type[lo:hi].tolist()
        uniq = list(dict.fromkeys(aids[::-1]))
        n_keep = min(len(uniq), uniq_cap)
        for t in EVENT_TYPES:
            w = np.logspace(lo_exp[t], 1, len(aids), base=2, endpoint=True) - 1
            c = Counter()
            for a, ty, wi in zip(aids, types, w):
                c[a] += wi * RECENCY_CANDGEN_COEFF[ty]
            out[t].append([a for a, _ in c.most_common(n_keep)])
    return out


def test_recency_matches_oracle(setup):
    sp, _ = setup
    cs = recency_candidates(sp.val_input, uniq_cap=32, chunk_sessions=128)
    oracle = oracle_recency(sp.val_input, uniq_cap=32)
    mismatch = 0
    for t in EVENT_TYPES:
        for s in range(sp.val_input.n_sessions):
            got = [int(a) for a in cs.candidates[t][s] if a >= 0]
            if got != oracle[t][s]:
                # float near-ties may swap adjacent entries; require same set
                assert set(got) == set(oracle[t][s]), (t, s)
                mismatch += 1
    assert mismatch < sp.val_input.n_sessions * 0.05


def test_covisit_candidates_shape(setup):
    sp, mats = setup
    cs = covisit_candidates(sp.val_input, mats, labels=sp.val_labels,
                            uniq_cap=32, wide_k=10, k_covisit=50, chunk_sessions=128)
    for t in EVENT_TYPES:
        assert cs.candidates[t].shape == (sp.val_input.n_sessions, 50)
        sess, flat_c, flat_s, flat_l = cs.flatten(t)
        assert len(sess) == len(flat_c) == len(flat_s) == len(flat_l)
        assert (flat_c >= 0).all()
