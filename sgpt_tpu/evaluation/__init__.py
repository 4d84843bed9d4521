from .metrics import (
    ndcg_at_k, map_at_k, recall_at_k, precision_at_k, mrr_at_k, accuracy_at_k,
    evaluate_retrieval, pearson, spearman,
)
from .beir import load_beir_dataset, EvaluateRetrieval

__all__ = [
    "ndcg_at_k", "map_at_k", "recall_at_k", "precision_at_k", "mrr_at_k",
    "accuracy_at_k", "evaluate_retrieval", "pearson", "spearman",
    "load_beir_dataset", "EvaluateRetrieval",
]
