from otto_tpu.eval.metrics import (
    click_recall_at_k,
    cart_order_recall_at_k,
    corpus_recall_at_k,
    map_at_k,
    hits_at_k,
    weighted_recall,
)
from otto_tpu.eval.harness import RecallReport, evaluate_predictions
from otto_tpu.eval.model_metrics import classification_scores, regression_scores, roc_auc

__all__ = [
    "click_recall_at_k",
    "cart_order_recall_at_k",
    "corpus_recall_at_k",
    "map_at_k",
    "hits_at_k",
    "weighted_recall",
    "RecallReport",
    "evaluate_predictions",
    "classification_scores",
    "regression_scores",
    "roc_auc",
]
