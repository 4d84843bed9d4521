"""Metric math vs hand-computed golden values (trec_eval conventions)."""
import math

import numpy as np
import pytest

from sgpt_tpu.evaluation import (
    ndcg_at_k, map_at_k, recall_at_k, precision_at_k, mrr_at_k, accuracy_at_k,
    evaluate_retrieval, pearson, spearman,
)

QRELS = {
    "q1": {"d1": 2, "d2": 1, "d9": 0},
    "q2": {"d3": 1},
    "q3": {},  # no positives: excluded from averages (trec_eval behavior)
}
RESULTS = {
    "q1": {"d1": 0.9, "d5": 0.8, "d2": 0.7},
    "q2": {"d4": 0.9, "d3": 0.5},
}


def test_ndcg_golden():
    # q1: gains at ranks 1..3 = [2,0,1]; DCG = 2 + 0 + 1/2 = 2.5
    #     ideal = 2 + 1/log2(3) = 2.6309
    # q2: gains = [0,1]; DCG = 1/log2(3) = 0.6309; ideal = 1
    want = ((2 + 1 / math.log2(4)) / (2 + 1 / math.log2(3)) + 1 / math.log2(3)) / 2
    assert abs(ndcg_at_k(QRELS, RESULTS, 10) - want) < 1e-9


def test_map_golden():
    # q1: hits at ranks 1,3 → AP = (1/1 + 2/3)/2; q2: hit at rank 2 → AP = 1/2
    want = ((1 + 2 / 3) / 2 + 0.5) / 2
    assert abs(map_at_k(QRELS, RESULTS, 10) - want) < 1e-9


def test_recall_precision_mrr_acc():
    assert recall_at_k(QRELS, RESULTS, 10) == (2 / 2 + 1 / 1) / 2
    assert recall_at_k(QRELS, RESULTS, 1) == (1 / 2 + 0) / 2
    assert precision_at_k(QRELS, RESULTS, 2) == (1 / 2 + 1 / 2) / 2
    assert mrr_at_k(QRELS, RESULTS, 10) == (1.0 + 0.5) / 2
    assert accuracy_at_k(QRELS, RESULTS, 1) == 0.5


def test_evaluate_retrieval_shapes():
    ndcg, m, r, p = evaluate_retrieval(QRELS, RESULTS, (1, 10))
    assert set(ndcg) == {"NDCG@1", "NDCG@10"}
    assert set(m) == {"MAP@1", "MAP@10"}
    assert set(r) == {"Recall@1", "Recall@10"}
    assert set(p) == {"P@1", "P@10"}


def test_correlations_vs_scipy():
    scipy_stats = pytest.importorskip("scipy.stats")
    rng = np.random.default_rng(0)
    x = rng.normal(size=50).tolist()
    y = (np.asarray(x) * 0.5 + rng.normal(size=50) * 0.2).tolist()
    assert abs(pearson(x, y) - scipy_stats.pearsonr(x, y)[0]) < 1e-12
    assert abs(spearman(x, y) - scipy_stats.spearmanr(x, y)[0]) < 1e-12
    # with ties
    xt = [1.0, 2.0, 2.0, 3.0, 0.5]
    yt = [0.1, 0.4, 0.3, 0.9, 0.05]
    assert abs(spearman(xt, yt) - scipy_stats.spearmanr(xt, yt)[0]) < 1e-12
