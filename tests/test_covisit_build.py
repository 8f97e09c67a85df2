"""Covisitation-builder parity vs a brute-force numpy oracle implementing the
documented kind semantics (otto_tpu/ops/covisit.py docstring table)."""

from collections import defaultdict

import numpy as np
import pytest

from otto_tpu.config import COVISIT_KINDS, CovisitConfig
from otto_tpu.data.synthetic import synthetic_events
from otto_tpu.models.covisitation import CovisitationMatrices, build_covisitation

DAY = 24 * 3600


def oracle_build(store, n_aids, cfg):
    t0, t1 = store.ts.min(), store.ts.max()
    type_mult = (cfg.click_weight, cfg.cart_weight, cfg.order_weight)
    acc = {k: defaultdict(float) for k in COVISIT_KINDS}
    for s in range(store.n_sessions):
        lo, hi = store.offsets[s], store.offsets[s + 1]
        a = store.aid[lo:hi][-cfg.session_tail :]
        t = store.type[lo:hi][-cfg.session_tail :]
        ts = store.ts[lo:hi][-cfg.session_tail :]
        n = len(a)
        for i in range(n):
            for j in range(n):
                if i == j or a[i] == a[j]:
                    continue
                dt = abs(int(ts[i]) - int(ts[j]))
                key = (int(a[i]), int(a[j]))
                tw = 1.0 + 3.0 * (float(ts[j]) - t0) / max(float(t1 - t0), 1.0)
                tm = type_mult[t[j]]
                if dt <= cfg.window_seconds:
                    acc["time_weighted"][key] += tw
                    if t[i] == 0:
                        acc["click_weighted"][key] += tm
                    if t[i] <= 1:
                        acc["cart_weighted"][key] += tm
                    if t[i] >= 1:
                        acc["order_weighted"][key] += tm
                    if t[i] == 0 and t[j] == 1:
                        acc["click_cart"][key] += 1.0
                    if t[i] == 0 and t[j] == 2:
                        acc["click_order"][key] += 1.0
                if dt <= 14 * DAY and t[i] >= 1 and t[j] >= 1:
                    acc["cart_order"][key] += 1.0
    return acc


def oracle_topk(acc_kind, n_aids, k):
    rows = defaultdict(list)
    for (x, y), w in acc_kind.items():
        if w > 0:
            rows[x].append((y, w))
    table = np.full((n_aids, k), -1, np.int32)
    for x, items in rows.items():
        items.sort(key=lambda p: (-p[1], p[0]))
        for r, (y, _) in enumerate(items[:k]):
            table[x, r] = y
    return table


@pytest.fixture(scope="module")
def built():
    es = synthetic_events(n_sessions=400, n_aids=300, mean_length=10, seed=31)
    cfg = CovisitConfig(top_k_wide=10, session_tail=20)
    mats = build_covisitation(es, n_aids=300, config=cfg, chunk_sessions=128)
    return es, cfg, mats


def test_tables_match_oracle(built):
    es, cfg, mats = built
    acc = oracle_build(es, 300, cfg)
    for kind in COVISIT_KINDS:
        expected = oracle_topk(acc[kind], 300, cfg.top_k_wide)
        got, gw = mats.tables[kind]
        if kind == "time_weighted":
            # fractional weights: float32 device accumulation can swap
            # near-ties vs the float64 oracle — check aggregated weights
            # agree per pair instead of exact ordering
            for x in range(300):
                exp_pairs = {int(y): w for (xx, y), w in acc[kind].items() if xx == x}
                for r in range(cfg.top_k_wide):
                    y = int(got[x, r])
                    if y < 0:
                        continue
                    assert y in exp_pairs
                    np.testing.assert_allclose(gw[x, r], exp_pairs[y], rtol=1e-3)
                # the table must hold the top-k by weight up to float32 slack
                if exp_pairs:
                    kth = sorted(exp_pairs.values(), reverse=True)[: cfg.top_k_wide][-1]
                    got_ws = gw[x][got[x] >= 0]
                    assert np.all(got_ws >= kth - 1e-2)
        else:
            # integer-valued weights: exact parity including tie order
            mism = np.flatnonzero(~(expected == got).all(axis=1))
            assert len(mism) == 0, (kind, mism[:5], expected[mism[:1]], got[mism[:1]])


def test_weights_positive_and_sorted(built):
    _, cfg, mats = built
    for kind, (aids, weights) in mats.tables.items():
        valid = aids >= 0
        assert np.all(weights[valid] > 0)
        assert np.all(weights[~valid] == 0)
        # weights non-increasing along each valid row prefix
        both_valid = valid[:, 1:] & valid[:, :-1]
        diffs = np.diff(weights, axis=1)[both_valid]
        assert np.all(diffs <= 1e-6)
        # padding only ever trails valid entries
        assert np.all(valid[:, 1:] <= valid[:, :-1])


def test_save_load_roundtrip(built, tmp_path):
    _, _, mats = built
    mats.save(tmp_path)
    loaded = CovisitationMatrices.load(tmp_path)
    for kind in COVISIT_KINDS:
        np.testing.assert_array_equal(loaded.tables[kind][0], mats.tables[kind][0])


def test_sharded_build_matches_single_device(built):
    import jax

    from otto_tpu.config import MeshConfig
    from otto_tpu.parallel.mesh import make_mesh

    es, cfg, mats = built
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    sharded = build_covisitation(es, n_aids=300, config=cfg, chunk_sessions=128, mesh=mesh)
    for kind in COVISIT_KINDS:
        a1, w1 = mats.tables[kind]
        a2, w2 = sharded.tables[kind]
        np.testing.assert_array_equal(a1, a2)
        np.testing.assert_allclose(w1, w2, rtol=1e-5)


def test_pair_accumulator_lossless_when_cap_not_binding():
    """Streaming through PairAccumulator with a generous per-aid cap must be
    bit-identical to a one-shot merge, no matter how often it compacts."""
    from otto_tpu.ops.covisit import PairAccumulator, merge_sorted_chunks

    rng = np.random.default_rng(0)
    n_aids = 50
    chunks = []
    for _ in range(30):
        ax = rng.integers(0, n_aids, size=200)
        ay = rng.integers(0, n_aids, size=200)
        k = (ax * n_aids + ay).astype(np.int64)
        w = rng.random((200, 7)).astype(np.float32)
        chunks.append((np.sort(k), w))
    acc = PairAccumulator(n_aids, budget_rows=500, per_aid_cap=n_aids)  # cap never binds
    for k, w in chunks:
        acc.add(k, w)
    got_k, got_w = acc.finish()
    exp_k, exp_w = merge_sorted_chunks([c[0] for c in chunks], [c[1] for c in chunks])
    assert acc.n_compactions > 5
    np.testing.assert_array_equal(got_k, exp_k)
    np.testing.assert_allclose(got_w, exp_w, rtol=1e-5)


def test_bounded_budget_build_matches_exact(built):
    """A build under a tiny row budget (many lossy compactions) must produce
    near-identical top-k tables: the per-aid cap (32) is far above the final
    k (10), so only deep-tail near-ties can move."""
    es, cfg, mats_exact = built
    mats_b = build_covisitation(
        es, n_aids=300, config=cfg, chunk_sessions=128,
        budget_rows=4_000, per_aid_cap=32,
    )
    total = agree = 0
    for kind in COVISIT_KINDS:
        a1 = mats_exact.tables[kind][0]
        a2 = mats_b.tables[kind][0]
        total += a1.size
        agree += int((a1 == a2).sum())
    assert agree / total >= 0.995, agree / total


def test_progress_cb_counts_packed_events():
    # the callback reports packed-tail events (sessions clipped to
    # session_tail) in monotonically increasing order, ending at the packed
    # total — the denominator a long-running build's partial flush reports
    es = synthetic_events(n_sessions=300, n_aids=200, mean_length=10, seed=7)
    cfg = CovisitConfig(top_k_wide=10, session_tail=20)
    seen = []
    build_covisitation(es, n_aids=200, config=cfg, chunk_sessions=64,
                       progress_cb=lambda ev, acc: seen.append(ev))
    lens = np.minimum(np.diff(es.offsets), cfg.session_tail)
    assert seen, "progress callback never fired"
    assert seen == sorted(seen)
    assert seen[-1] == int(lens.sum())


def test_prune_per_source_matches_full_lexsort_reference():
    """The subset-lexsort prune (r5: selection work proportional to the
    overflow, not the table) must select exactly the rows the original
    full-table ``lexsort((-score, aid_x))`` rank-< cap rule selected,
    including stable tie-breaks."""
    from otto_tpu.ops.covisit import COVISIT_KINDS, prune_per_source

    rng = np.random.default_rng(11)
    n_aids, cap, rows = 50, 4, 3_000
    aid_x = np.sort(rng.integers(0, n_aids, rows))
    aid_y = rng.integers(0, n_aids, rows)
    keys = np.asarray(aid_x * n_aids + aid_y, np.int64)
    keys.sort()
    w = rng.random((rows, len(COVISIT_KINDS))).astype(np.float32)
    # quantize so score ties actually occur and exercise the tie-break
    w = np.round(w, 1)

    def reference(keys, weights):
        ax = keys // n_aids
        scale = weights.mean(axis=0)
        score = (weights / np.maximum(scale, 1e-30)).max(axis=1)
        order = np.lexsort((-score, ax))
        axo = ax[order]
        gs = np.concatenate([[True], axo[1:] != axo[:-1]])
        start = np.maximum.accumulate(np.where(gs, np.arange(len(axo)), 0))
        rank = np.arange(len(axo)) - start
        keep = np.zeros(len(keys), dtype=bool)
        keep[order[rank < cap]] = True
        return keys[keep], weights[keep]

    k1, w1 = prune_per_source(keys.copy(), w.copy(), n_aids, cap)
    k2, w2 = reference(keys, w)
    np.testing.assert_array_equal(k1, k2)
    np.testing.assert_array_equal(w1, w2)
    # all-small-groups fast path: nothing pruned, arrays returned unchanged
    few = np.asarray(np.sort(rng.choice(n_aids * n_aids, 40, replace=False)), np.int64)
    wf = rng.random((40, len(COVISIT_KINDS))).astype(np.float32)
    k3, w3 = prune_per_source(few, wf, n_aids, cap=64)
    np.testing.assert_array_equal(k3, few)
