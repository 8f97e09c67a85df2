"""Score blending across ranker models.

Reproduces src/ranker/inference.py:14-55 + :64-85: per-model prediction
tables are robust-scaled (median/IQR — sklearn RobustScaler semantics),
outer-joined on (session, aid) with missing scores as 0, combined with fixed
convex weights, and cut to the per-session top-20.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from otto_tpu.logging_utils import get_logger

log = get_logger(__name__)


def robust_scale(scores: np.ndarray) -> np.ndarray:
    """(x - median) / IQR (sklearn RobustScaler on a single column)."""
    med = np.median(scores)
    q1, q3 = np.percentile(scores, [25, 75])
    iqr = q3 - q1
    if iqr == 0:
        return scores - med
    return (scores - med) / iqr


@dataclass
class ModelPredictions:
    """Flat (session, aid, score) predictions of one model for one event type."""

    session: np.ndarray  # int64 [n]
    aid: np.ndarray  # int32 [n]
    score: np.ndarray  # float32 [n]

    def scaled(self) -> "ModelPredictions":
        return ModelPredictions(self.session, self.aid, robust_scale(self.score.astype(np.float64)).astype(np.float32))


def blend(
    predictions: dict[str, ModelPredictions],
    weights: dict[str, float],
    k: int = 20,
    scale: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Outer-join per-model scores on (session, aid), weight, and take the
    per-session top-k.

    Returns (session_ids [S], top_aids int32 [S, k] padded -1), sessions
    sorted ascending.
    """
    # global key space
    all_sessions = np.unique(np.concatenate([p.session for p in predictions.values()]))
    sess_index = {s: i for i, s in enumerate(all_sessions)}

    keys_list, scores_list = [], []
    for name, pred in predictions.items():
        p = pred.scaled() if scale else pred
        w = weights[name]
        sidx = np.searchsorted(all_sessions, p.session)
        key = sidx.astype(np.int64) << 32 | p.aid.astype(np.int64)
        keys_list.append(key)
        scores_list.append(w * p.score.astype(np.float64))

    keys = np.concatenate(keys_list)
    scores = np.concatenate(scores_list)
    order = np.argsort(keys, kind="stable")
    keys, scores = keys[order], scores[order]
    head = np.concatenate([[True], keys[1:] != keys[:-1]])
    starts = np.flatnonzero(head)
    blended = np.add.reduceat(scores, starts)
    ukeys = keys[starts]
    sidx = (ukeys >> 32).astype(np.int64)
    aids = (ukeys & 0xFFFFFFFF).astype(np.int32)

    # per-session top-k by blended score (desc), stable
    order2 = np.lexsort((-blended, sidx))
    sidx, aids, blended = sidx[order2], aids[order2], blended[order2]
    group_start = np.concatenate([[True], sidx[1:] != sidx[:-1]])
    start_idx = np.maximum.accumulate(np.where(group_start, np.arange(len(sidx)), 0))
    rank = np.arange(len(sidx)) - start_idx
    keep = rank < k
    out = np.full((len(all_sessions), k), -1, np.int32)
    out[sidx[keep], rank[keep]] = aids[keep]
    return all_sessions, out
