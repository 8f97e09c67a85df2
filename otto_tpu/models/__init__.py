from otto_tpu.models.frequency import FrequencyStatistics, aid_frequency_predictions
from otto_tpu.models.recency import aid_weight_predictions
from otto_tpu.models.covisitation import (
    CovisitationMatrices,
    build_covisitation,
    covisit_heuristic_predictions,
)
from otto_tpu.models.candidates import (
    CandidateSet,
    covisit_candidates,
    embedding_candidates,
    recency_candidates,
    regular_candidates,
)
from otto_tpu.models.embeddings import (
    SGNSModel,
    SessionEmbeddingModel,
    embedding_knn_predictions,
    session_embeddings,
    train_sgns,
)
from otto_tpu.models.matrix_factorization import CFModel, MFModel, train_cf, train_mf
from otto_tpu.models.sequence import SequenceModel, sequence_serving_predictions, train_sequence_model
from otto_tpu.models.tfidf import TfIdfModel
from otto_tpu.models.ranker import RankerData, RankerModel, train_ranker
from otto_tpu.models.gbdt import (
    GBDTForest,
    GBDTRankerModel,
    load_ranker_model,
    train_gbdt_ranker,
)
from otto_tpu.models.ensemble import ModelPredictions, blend

__all__ = [
    "FrequencyStatistics", "aid_frequency_predictions", "aid_weight_predictions",
    "CovisitationMatrices", "build_covisitation", "covisit_heuristic_predictions",
    "CandidateSet", "covisit_candidates", "embedding_candidates",
    "recency_candidates", "regular_candidates",
    "SGNSModel", "SessionEmbeddingModel", "embedding_knn_predictions",
    "session_embeddings", "train_sgns",
    "CFModel", "MFModel", "train_cf", "train_mf",
    "SequenceModel", "sequence_serving_predictions", "train_sequence_model",
    "TfIdfModel", "RankerData", "RankerModel", "train_ranker",
    "GBDTForest", "GBDTRankerModel", "load_ranker_model", "train_gbdt_ranker",
    "ModelPredictions", "blend",
]
