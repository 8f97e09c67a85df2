"""Label-builder tests against a direct reimplementation of the reference's
reversed-scan oracle (src/validation.py:9-52)."""

import numpy as np

from otto_tpu.data.events import EventStore
from otto_tpu.data.labels import build_labels, random_cutoffs
from otto_tpu.data.synthetic import synthetic_events


def oracle_labels(aids, types, cutoff):
    """Reference semantics, restated: labels at position `cutoff` are built
    from events strictly after the cutoff — first later click, all later
    carted aids, all later ordered aids."""
    click = None
    carts, orders = set(), set()
    for a, t in zip(aids[cutoff + 1 :], types[cutoff + 1 :]):
        if t == 0 and click is None:
            click = a
        elif t == 1:
            carts.add(a)
        elif t == 2:
            orders.add(a)
    return click, carts, orders


def reversed_scan_oracle(aids, types, cutoff):
    """Literal restatement of the reference's reversed scan to guard the
    equivalence claim in oracle_labels."""
    previous_click, carts, orders = None, set(), set()
    labels = []
    for a, t in zip(reversed(aids), reversed(types)):
        if t == 0:
            previous_click = a
        elif t == 1:
            carts.add(a)
        elif t == 2:
            orders.add(a)
        labels.append((previous_click, set(carts), set(orders)))
    labels = labels[:-1][::-1]
    labels.append((None, set(), set()))
    return labels[cutoff]


def test_oracles_agree():
    rng = np.random.default_rng(0)
    for _ in range(200):
        n = rng.integers(2, 15)
        aids = rng.integers(0, 20, n).tolist()
        types = rng.integers(0, 3, n).tolist()
        for cutoff in range(n):
            a = oracle_labels(aids, types, cutoff)
            b = reversed_scan_oracle(aids, types, cutoff)
            assert a == b, (aids, types, cutoff, a, b)


def test_build_labels_matches_oracle():
    es = synthetic_events(n_sessions=250, n_aids=300, seed=11)
    rng = np.random.default_rng(1)
    cutoffs = random_cutoffs(es, rng)
    labels = build_labels(es, cutoffs)

    for s in range(es.n_sessions):
        lo, hi = es.offsets[s], es.offsets[s + 1]
        aids = es.aid[lo:hi].tolist()
        types = es.type[lo:hi].tolist()
        click, carts, orders = oracle_labels(aids, types, int(cutoffs[s]))
        got_click = int(labels.click[s])
        assert got_click == (click if click is not None else -1)
        got_carts = set(labels.cart_flat[labels.cart_offsets[s] : labels.cart_offsets[s + 1]].tolist())
        got_orders = set(
            labels.order_flat[labels.order_offsets[s] : labels.order_offsets[s + 1]].tolist()
        )
        assert got_carts == carts
        assert got_orders == orders


def test_random_cutoffs_keep_trailing_click():
    es = synthetic_events(n_sessions=300, n_aids=300, seed=12)
    rng = np.random.default_rng(2)
    cutoffs = random_cutoffs(es, rng)
    labels = build_labels(es, cutoffs)
    # every session that has any click after pos 0 must end with a click label
    for s in range(es.n_sessions):
        lo, hi = es.offsets[s], es.offsets[s + 1]
        types = es.type[lo:hi]
        click_pos = np.flatnonzero(types == 0)
        if len(click_pos) and click_pos[-1] > 0 and es.lengths[s] > 2:
            assert labels.click[s] >= 0
    assert np.all(cutoffs >= 0)
    assert np.all(cutoffs < es.lengths)


def test_padded_labels():
    es = synthetic_events(n_sessions=100, n_aids=100, seed=13)
    cutoffs = np.zeros(es.n_sessions, dtype=np.int64)
    labels = build_labels(es, cutoffs)
    padded = labels.padded("carts")
    counts = (padded >= 0).sum(axis=1)
    np.testing.assert_array_equal(counts, labels.cart_counts)


def test_labels_take_subsets_rows():
    es = synthetic_events(n_sessions=200, n_aids=150, seed=14)
    cutoffs = np.zeros(es.n_sessions, dtype=np.int64)
    labels = build_labels(es, cutoffs)
    idx = np.random.default_rng(0).permutation(es.n_sessions)[:73]
    sub = labels.take(idx)
    assert sub.n_sessions == 73
    np.testing.assert_array_equal(sub.click, labels.click[idx])
    np.testing.assert_array_equal(sub.session_ids, labels.session_ids[idx])
    for j, s in enumerate(idx):
        for flat, off, sflat, soff in (
            (labels.cart_flat, labels.cart_offsets, sub.cart_flat, sub.cart_offsets),
            (labels.order_flat, labels.order_offsets, sub.order_flat, sub.order_offsets),
        ):
            want = flat[off[s] : off[s + 1]].tolist()
            got = sflat[soff[j] : soff[j + 1]].tolist()
            assert got == want
