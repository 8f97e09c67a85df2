"""Kaggle submission writer.

Format (reference: src/baseline/aid_frequency.py:108-115): rows
``"{session}_{clicks|carts|orders}", "aid1 aid2 ... aid20"`` in a gzip CSV
with header ``session_type,labels``.
"""

from __future__ import annotations

import gzip
from pathlib import Path

import numpy as np

from otto_tpu import EVENT_TYPES


def write_submission(
    path: str | Path,
    session_ids: np.ndarray,
    predictions: dict[str, np.ndarray],
) -> None:
    """``predictions`` maps event type name ('clicks'/'carts'/'orders') to an
    ``[S, <=20]`` int array padded with -1."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with gzip.open(path, "wt", newline="") as f:
        f.write("session_type,labels\n")
        per_type_rows = {}
        for etype in EVENT_TYPES:
            preds = predictions[etype]
            rows = []
            for s in range(preds.shape[0]):
                row = preds[s]
                rows.append(" ".join(str(int(a)) for a in row[row >= 0]))
            per_type_rows[etype] = rows
        for s, sid in enumerate(session_ids):
            for etype in EVENT_TYPES:
                f.write(f"{int(sid)}_{etype},{per_type_rows[etype][s]}\n")


def read_submission(path: str | Path) -> dict[str, dict[int, list[int]]]:
    """Inverse of :func:`write_submission`, for tests."""
    out: dict[str, dict[int, list[int]]] = {t: {} for t in EVENT_TYPES}
    with gzip.open(path, "rt") as f:
        header = f.readline()
        assert header.strip() == "session_type,labels"
        for line in f:
            session_type, labels = line.rstrip("\n").split(",", 1)
            sid, etype = session_type.rsplit("_", 1)
            out[etype][int(sid)] = [int(a) for a in labels.split()] if labels else []
    return out
