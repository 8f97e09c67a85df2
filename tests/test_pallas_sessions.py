"""Pallas session-vote kernel vs the XLA reference path (interpret mode on
CPU; the same code compiles with Mosaic on TPU)."""

import numpy as np
import pytest

from otto_tpu.ops.pallas_sessions import aid_vote_aggregate, per_aid_weight_top_pallas
from otto_tpu.ops.sessions import per_aid_weight_top


def test_vote_aggregate_matches_bruteforce():
    rng = np.random.default_rng(0)
    S, L = 20, 128
    aids = rng.integers(0, 12, (S, L)).astype(np.int32)
    aids[:, -10:] = -1  # padding
    w = rng.random((S, L)).astype(np.float32)
    w[aids < 0] = 0
    agg, first, firstpos = aid_vote_aggregate(aids, w, session_tile=4, interpret=True)
    agg, first, firstpos = map(np.asarray, (agg, first, firstpos))
    for s in range(S):
        for i in range(L):
            if aids[s, i] < 0:
                continue
            same = aids[s] == aids[s, i]
            expected = w[s][same].sum()
            assert abs(agg[s, i] - expected) < 1e-3, (s, i)
            assert first[s, i] == int(not same[:i].any())
            assert firstpos[s, i] == int(np.flatnonzero(same)[0])


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_top_matches_xla_path(seed):
    rng = np.random.default_rng(seed)
    S, L = 30, 64
    aids = rng.integers(0, 15, (S, L)).astype(np.int32)
    w = rng.integers(1, 5, (S, L)).astype(np.float32)  # integer weights: exact ties
    mask = rng.random((S, L)) < 0.9
    ref_a, ref_w = per_aid_weight_top(aids, w, mask, k=10)
    got_a, got_w = per_aid_weight_top_pallas(aids, w, mask, k=10, session_tile=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_a), np.asarray(ref_a))
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w), rtol=1e-5)
