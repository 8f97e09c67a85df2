"""End-to-end pipeline entry points (validation / submission modes).

Each reference model script is an argparse ``__main__`` with a
``mode in {validation, submission}`` contract writing files under hardcoded
paths.  Here the equivalents are plain functions over in-memory stores, plus a
small CLI (``python -m otto_tpu.pipelines``) for file-based runs.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from otto_tpu import TOP_K
from otto_tpu.config import DataConfig
from otto_tpu.data import EventStore, splits, submission
from otto_tpu.data.labels import SessionLabels
from otto_tpu.eval import RecallReport, evaluate_predictions
from otto_tpu.logging_utils import get_logger
from otto_tpu.models.frequency import FrequencyStatistics, aid_frequency_predictions
from otto_tpu.models.recency import (
    SUBMISSION_COEFFICIENTS,
    VALIDATION_COEFFICIENTS,
    aid_weight_predictions,
)

log = get_logger(__name__)

# Device-friendly packing width: sessions longer than this keep their most
# recent MAX_SESSION_LEN events (recency weights still use true positions).
MAX_SESSION_LEN = 256


def _packed(store: EventStore, max_len: int = MAX_SESSION_LEN):
    return store.pack(max_len=min(max_len, max(int(store.lengths.max(initial=1)), 1)), keep="last")


@dataclass
class BaselineResult:
    predictions: dict[str, np.ndarray]
    report: RecallReport | None


def run_aid_frequency(
    train: EventStore,
    target: EventStore,
    n_aids: int,
    labels: SessionLabels | None = None,
    k: int = TOP_K,
) -> BaselineResult:
    """aid-frequency baseline (reference: src/baseline/aid_frequency.py)."""
    stats = FrequencyStatistics.compute(train, n_aids=n_aids, k=k)
    preds = aid_frequency_predictions(_packed(target), stats, k=k)
    report = None
    if labels is not None:
        report = evaluate_predictions(labels, preds["clicks"], preds["carts"], preds["orders"])
        log.info("aid frequency validation scores\n%s", report)
    return BaselineResult(preds, report)


def run_aid_weight(
    target: EventStore,
    labels: SessionLabels | None = None,
    k: int = TOP_K,
) -> BaselineResult:
    """aid-weight recency baseline (reference: src/baseline/aid_weight.py).
    Validation mode uses type coefficients {1,6,3}; submission {1,3,6}."""
    coeffs = VALIDATION_COEFFICIENTS if labels is not None else SUBMISSION_COEFFICIENTS
    preds = aid_weight_predictions(_packed(target), coefficients=coeffs, k=k)
    report = None
    if labels is not None:
        report = evaluate_predictions(labels, preds["clicks"], preds["carts"], preds["orders"])
        log.info("aid weight validation scores\n%s", report)
    return BaselineResult(preds, report)


def main(argv=None):
    import argparse

    parser = argparse.ArgumentParser(prog="otto_tpu.pipelines")
    parser.add_argument("model", choices=["aid_frequency", "aid_weight"])
    parser.add_argument("mode", choices=["validation", "submission"])
    parser.add_argument("--events", required=True, help="parquet of (session, aid, ts, type)")
    parser.add_argument("--output", default=None, help="submission csv.gz path")
    parser.add_argument("--n-aids", type=int, default=DataConfig().n_aids)
    parser.add_argument("--val-fraction", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    store = EventStore.from_parquet(args.events)
    if args.mode == "validation":
        sp = splits.split_by_fraction(store, val_fraction=args.val_fraction, seed=args.seed)
        if args.model == "aid_frequency":
            result = run_aid_frequency(sp.train, sp.val_input, args.n_aids, sp.val_labels)
        else:
            result = run_aid_weight(sp.val_input, sp.val_labels)
        print(result.report)
    else:
        if args.model == "aid_frequency":
            result = run_aid_frequency(store, store, args.n_aids)
        else:
            result = run_aid_weight(store)
        out = args.output or f"{args.model}_submission.csv.gz"
        submission.write_submission(out, store.session_ids, result.predictions)
        print(f"wrote {out}")
    return result


if __name__ == "__main__":
    main()
