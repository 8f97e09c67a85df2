"""End-to-end pipeline entry points (validation / submission modes).

Each reference model script is an argparse ``__main__`` with a
``mode in {validation, submission}`` contract writing files under hardcoded
paths.  Here the equivalents are plain functions over in-memory stores, plus a
small CLI (``python -m otto_tpu.pipelines``) for file-based runs.
"""

from __future__ import annotations

from dataclasses import dataclass


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


def run_covisit_heuristic(
    train: EventStore,
    target: EventStore,
    n_aids: int,
    labels: SessionLabels | None = None,
    k: int = TOP_K,
) -> BaselineResult:
    """Covisitation heuristic recommender end to end (reference:
    src/covisitation/inference.py)."""
    from otto_tpu import EVENT_TYPES
    from otto_tpu.models.covisitation import build_covisitation, covisit_heuristic_predictions
    from otto_tpu.models.frequency import FrequencyStatistics

    mats = build_covisitation(train, n_aids)
    stats = FrequencyStatistics.compute(train, n_aids=n_aids, k=k)
    stats_top = {t: stats.top_by_type[t] for t in EVENT_TYPES}
    preds = covisit_heuristic_predictions(target, mats, stats_top, k=k)
    report = None
    if labels is not None:
        report = evaluate_predictions(labels, preds["clicks"], preds["carts"], preds["orders"])
        log.info("covisitation heuristic validation scores\n%s", report)
    return BaselineResult(preds, report)


def main(argv=None):
    import argparse

    from otto_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()

    parser = argparse.ArgumentParser(prog="otto_tpu.pipelines")
    parser.add_argument(
        "model", choices=["aid_frequency", "aid_weight", "covisitation", "two_stage"]
    )
    parser.add_argument("mode", choices=["validation", "submission"])
    parser.add_argument("--events", required=True,
                        help="parquet of (session, aid, ts, type) or .jsonl raw file")
    parser.add_argument("--output", default=None, help="submission csv.gz path")
    parser.add_argument("--n-aids", type=int, default=DataConfig().n_aids)
    parser.add_argument("--val-fraction", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    if str(args.events).endswith(".jsonl"):
        from otto_tpu.data.ingest import read_jsonl

        store = read_jsonl(args.events)
    else:
        store = EventStore.from_parquet(args.events)

    if args.mode == "validation":
        sp = splits.split_by_fraction(store, val_fraction=args.val_fraction, seed=args.seed)
        if args.model == "aid_frequency":
            result = run_aid_frequency(sp.train, sp.val_input, args.n_aids, sp.val_labels)
        elif args.model == "aid_weight":
            result = run_aid_weight(sp.val_input, sp.val_labels)
        elif args.model == "covisitation":
            result = run_covisit_heuristic(sp.train, sp.val_input, args.n_aids, sp.val_labels)
        else:
            from otto_tpu.twostage import run_two_stage

            art = run_two_stage(sp.train, sp.val_input, args.n_aids, labels=sp.val_labels)
            result = BaselineResult(art.predictions, art.report)
        print(result.report)
    else:
        if args.model == "aid_frequency":
            result = run_aid_frequency(store, store, args.n_aids)
        elif args.model == "aid_weight":
            result = run_aid_weight(store)
        elif args.model == "covisitation":
            result = run_covisit_heuristic(store, store, args.n_aids)
        else:
            raise SystemExit("two_stage submission mode: use otto_tpu.twostage.predict_two_stage")
        out = args.output or f"{args.model}_submission.csv.gz"
        submission.write_submission(out, store.session_ids, result.predictions)
        print(f"wrote {out}")
    return result


if __name__ == "__main__":
    main()
