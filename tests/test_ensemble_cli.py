"""File-based multi-model ensemble: the reference's final inference stage
(src/ranker/inference.py:14-85,123-140,321-337) — load N per-model prediction
files, robust-scale, outer-join on (session, aid), fixed-weight blend, top-20,
OOF + holdout recall report, submission write."""

import json

import numpy as np
import pytest

from otto_tpu import EVENT_TYPES
from otto_tpu.data import submission
from otto_tpu.data.splits import split_by_time
from otto_tpu.data.synthetic import synthetic_events_v2
from otto_tpu.models.ensemble import (
    ModelPredictions,
    align_to_sessions,
    blend,
    blend_files,
    candidate_set_predictions,
    read_predictions,
    save_predictions,
)
from otto_tpu.pipelines import run_aid_frequency, run_covisit_heuristic, run_ensemble


def test_prediction_file_roundtrip(tmp_path):
    s = np.array([5, 5, 9], np.int64)
    a = np.array([1, 2, 3], np.int32)
    w = np.array([0.5, 0.25, 1.5], np.float32)
    for name in ("p.npz", "p.parquet"):
        save_predictions(tmp_path / name, s, a, w)
        p = read_predictions(tmp_path / name)
        np.testing.assert_array_equal(p.session, s)
        np.testing.assert_array_equal(p.aid, a)
        np.testing.assert_allclose(p.score, w)


def test_align_to_sessions_handles_missing():
    blended = (np.array([3, 7], np.int64), np.array([[10, 11], [12, -1]], np.int32))
    out = align_to_sessions(np.array([1, 3, 7, 9], np.int64), blended, k=2)
    np.testing.assert_array_equal(out, [[-1, -1], [10, 11], [12, -1], [-1, -1]])


def test_blend_outer_join_weights():
    # model A knows session 1, model B knows sessions 1 and 2; scores chosen
    # so the blend order flips A's preference in session 1
    a = ModelPredictions(np.array([1, 1]), np.array([10, 11], np.int32),
                         np.array([2.0, 1.0], np.float32))
    b = ModelPredictions(np.array([1, 2]), np.array([11, 12], np.int32),
                         np.array([5.0, 1.0], np.float32))
    sessions, top = blend({"a": a, "b": b}, {"a": 0.2, "b": 0.8}, k=2, scale=False)
    np.testing.assert_array_equal(sessions, [1, 2])
    np.testing.assert_array_equal(top[0], [11, 10])  # 0.2*1+0.8*5 > 0.2*2
    np.testing.assert_array_equal(top[1], [12, -1])


@pytest.fixture(scope="module")
def blend_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ens")
    store = synthetic_events_v2(n_sessions=2500, n_aids=800, n_clusters=30, seed=21)
    split = split_by_time(store, val_fraction=0.25, seed=1)
    r_freq = run_aid_frequency(split.train, split.val_input, 800, split.val_labels)
    r_cov = run_covisit_heuristic(split.train, split.val_input, 800, split.val_labels)

    manifest = {}
    for etype in EVENT_TYPES:
        manifest[etype] = {}
        for name, res, w in (("freq", r_freq, 0.2), ("covisit", r_cov, 0.8)):
            p = res.predictions[etype]
            # rank-derived descending scores, the layout every ranker persists
            scores = np.where(p >= 0, np.arange(p.shape[1], 0, -1, dtype=np.float32), 0)
            mp = candidate_set_predictions(p, scores, split.val_input.session_ids)
            path = tmp / f"{name}_{etype}.npz"
            save_predictions(path, mp.session, mp.aid, mp.score)
            manifest[etype][name] = {"path": str(path), "weight": w}
    return split, manifest, r_freq, r_cov, tmp


def test_run_ensemble_validation_report(blend_setup):
    split, manifest, r_freq, r_cov, _ = blend_setup
    res = run_ensemble(manifest, split.val_labels, holdout_fraction=0.3)
    assert res.report is not None
    # a 0.2/0.8 blend dominated by the covisit model should stay within a few
    # points of it and far above the frequency baseline
    assert res.report.weighted > r_freq.report.weighted
    assert res.report.weighted > r_cov.report.weighted - 0.05


def test_ensemble_cli_submission(blend_setup, tmp_path):
    from otto_tpu.pipelines import main

    split, manifest, _, _, tmp = blend_setup
    mpath = tmp / "manifest.json"
    mpath.write_text(json.dumps(manifest))
    out = tmp_path / "blend_submission.csv.gz"
    main(["ensemble", "submission", "--manifest", str(mpath), "--output", str(out)])
    rt = submission.read_submission(out)
    assert set(rt) == set(EVENT_TYPES)
    assert len(rt["clicks"]) == split.val_input.n_sessions
