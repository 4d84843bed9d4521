"""InformationRetrievalEvaluator — IR dev-set eval during training.

Parity target: sentence_transformers/evaluation/InformationRetrievalEvaluator.py:23-231
(accuracy@k, precision/recall@k, MRR@k, nDCG@k, MAP@k over a chunked corpus;
the MSMARCO training entry evaluates dev retrieval with it,
examples/training/ms_marco/train_bi-encoder_mnrl.py:520-527).
"""
from __future__ import annotations

import logging
from typing import Dict, Sequence

import numpy as np

from .metrics import (accuracy_at_k, map_at_k, mrr_at_k, ndcg_at_k,
                      precision_at_k, recall_at_k)

logger = logging.getLogger(__name__)


class InformationRetrievalEvaluator:
    def __init__(self, queries: Dict[str, str], corpus: Dict[str, str],
                 relevant_docs: Dict[str, set], *,
                 mrr_at: Sequence[int] = (10,), ndcg_at: Sequence[int] = (10,),
                 accuracy_at: Sequence[int] = (1, 3, 5, 10),
                 precision_recall_at: Sequence[int] = (1, 3, 5, 10),
                 map_at: Sequence[int] = (100,),
                 main_metric: str = "map@100", name: str = ""):
        self.qids = [q for q in queries if q in relevant_docs and relevant_docs[q]]
        self.queries = queries
        self.corpus = corpus
        self.relevant = relevant_docs
        self.mrr_at, self.ndcg_at = mrr_at, ndcg_at
        self.accuracy_at, self.pr_at, self.map_at = accuracy_at, precision_recall_at, map_at
        self.main_metric = main_metric
        self.name = name

    def compute(self, encode_query_fn, encode_corpus_fn=None) -> dict:
        encode_corpus_fn = encode_corpus_fn or encode_query_fn
        doc_ids = list(self.corpus)
        q_emb = np.asarray(encode_query_fn([self.queries[q] for q in self.qids]))
        d_emb = np.asarray(encode_corpus_fn([self.corpus[d] for d in doc_ids]))

        qn = q_emb / np.clip(np.linalg.norm(q_emb, axis=1, keepdims=True), 1e-12, None)
        dn = d_emb / np.clip(np.linalg.norm(d_emb, axis=1, keepdims=True), 1e-12, None)
        scores = qn @ dn.T
        max_k = max([*self.mrr_at, *self.ndcg_at, *self.accuracy_at,
                     *self.pr_at, *self.map_at])
        top = np.argsort(-scores, axis=1)[:, :max_k]

        results = {
            qid: {doc_ids[j]: float(scores[i, j]) for j in top[i]}
            for i, qid in enumerate(self.qids)
        }
        qrels = {q: {d: 1 for d in self.relevant[q]} for q in self.qids}

        out = {}
        for k in self.accuracy_at:
            out[f"accuracy@{k}"] = accuracy_at_k(qrels, results, k)
        for k in self.pr_at:
            out[f"precision@{k}"] = precision_at_k(qrels, results, k)
            out[f"recall@{k}"] = recall_at_k(qrels, results, k)
        for k in self.mrr_at:
            out[f"mrr@{k}"] = mrr_at_k(qrels, results, k)
        for k in self.ndcg_at:
            out[f"ndcg@{k}"] = ndcg_at_k(qrels, results, k)
        for k in self.map_at:
            # ST parity: InformationRetrievalEvaluator divides AP by
            # min(k, n_rel), not trec_eval's total-relevant count
            out[f"map@{k}"] = map_at_k(qrels, results, k, divide_by="min_k_rel")
        logger.info("IR%s: %s=%.4f", f"[{self.name}]" if self.name else "",
                    self.main_metric, out[self.main_metric])
        return out

    def __call__(self, encode_query_fn, encode_corpus_fn=None) -> float:
        return self.compute(encode_query_fn, encode_corpus_fn)[self.main_metric]
