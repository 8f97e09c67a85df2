"""Multi-chip serving equivalence: the candidate generator and the heuristic
recommender routed through a 4x2 (data x model) virtual mesh must reproduce
the single-device predictions exactly (VERDICT round-1 weakness 6: serving
paths were single-device)."""

import numpy as np
import pytest

from otto_tpu import EVENT_TYPES
from otto_tpu.config import MeshConfig
from otto_tpu.data.splits import split_by_time
from otto_tpu.data.synthetic import synthetic_events_v2
from otto_tpu.models.candidates import regular_candidates
from otto_tpu.models.covisitation import build_covisitation, covisit_heuristic_predictions
from otto_tpu.models.frequency import FrequencyStatistics
from otto_tpu.parallel.mesh import make_mesh

N_AIDS = 700


@pytest.fixture(scope="module")
def setup():
    store = synthetic_events_v2(
        n_sessions=1500, n_aids=N_AIDS, mean_length=14.0, n_clusters=25, seed=17
    )
    split = split_by_time(store, val_fraction=0.3, seed=2)
    mats = build_covisitation(split.train, N_AIDS, chunk_sessions=256)
    stats = FrequencyStatistics.compute(split.train, n_aids=N_AIDS)
    rng = np.random.default_rng(9)
    ft45 = np.argsort(rng.random((N_AIDS, N_AIDS)), axis=1)[:, 1:46].astype(np.int32)
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    return split, mats, stats, ft45, mesh


def test_sharded_regular_candidates_equal(setup):
    split, mats, _, ft45, mesh = setup
    kw = dict(ft_neighbors=ft45[:, :20], wide_k=20, chunk_sessions=256)
    single = regular_candidates(split.val_input, mats, **kw)
    sharded = regular_candidates(split.val_input, mats, mesh=mesh, **kw)
    for t in EVENT_TYPES:
        np.testing.assert_array_equal(single.candidates[t], sharded.candidates[t])
        np.testing.assert_allclose(single.scores[t], sharded.scores[t], rtol=1e-5)


def test_sharded_heuristic_equal(setup):
    split, mats, stats, ft45, mesh = setup
    stats_top = {t: stats.top_by_type[t] for t in EVENT_TYPES}
    kw = dict(ft_neighbors=ft45, chunk_sessions=256)
    single = covisit_heuristic_predictions(split.val_input, mats, stats_top, **kw)
    sharded = covisit_heuristic_predictions(
        split.val_input, mats, stats_top, mesh=mesh, **kw
    )
    for t in EVENT_TYPES:
        np.testing.assert_array_equal(single[t], sharded[t])


def test_sharded_heuristic_no_ft(setup):
    split, mats, stats, _, mesh = setup
    stats_top = {t: stats.top_by_type[t] for t in EVENT_TYPES}
    single = covisit_heuristic_predictions(split.val_input, mats, stats_top,
                                           chunk_sessions=256)
    sharded = covisit_heuristic_predictions(split.val_input, mats, stats_top,
                                            mesh=mesh, chunk_sessions=256)
    for t in EVENT_TYPES:
        np.testing.assert_array_equal(single[t], sharded[t])
