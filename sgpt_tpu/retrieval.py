"""DenseRetriever — exact (brute-force) dense search over a corpus.

TPU-native re-design of the reference's `DenseRetrievalExactSearch`
(biencoder/beir/custommodels/exact_search.py:22-134). Same algorithm shape —
encode queries once, stream corpus chunks longest-first, keep top-k per query —
but the score matmul + per-chunk top-k + running merge all run on device
(ops/topk.chunked_topk) instead of torch.topk + host heapq. Memory stays
O(Q·k) on host and O(device_chunk·D) on device, so corpora far larger than HBM
stream through.
"""
from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .ops.pooling import normalize
from .ops.topk import blockmax_topk

logger = logging.getLogger(__name__)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class DenseRetriever:
    """search(corpus, queries, top_k) → {qid: {docid: score}} (BEIR results shape)."""

    def __init__(self, model, *, score_function: str = "cos_sim",
                 corpus_chunk_size: int = 50000, device_chunk: int = 8192):
        """model: anything with encode_queries(list[str]) / encode_corpus(list[dict]).

        corpus_chunk_size: docs encoded per host round (exact_search.py:80).
        device_chunk: max docs scored per device matmul — bounds the (Q,
        device_chunk) score slab in HBM (wired to blockmax_topk's slab
        scan). The reference's per-encode batch_size lives on the model
        itself here (EmbeddingEngine(batch_size=...)), not on the retriever.
        """
        if score_function not in ("cos_sim", "dot"):
            raise ValueError("score_function must be 'cos_sim' or 'dot'")
        self.model = model
        self.score_function = score_function
        self.corpus_chunk_size = corpus_chunk_size
        # round to a block multiple: blockmax_topk falls back to ONE
        # whole-chunk slab when the padded chunk doesn't tile by slab_size,
        # which would silently defeat the HBM bound this knob promises
        self.device_chunk = _round_up(max(128, device_chunk), 128)

    def search(self, corpus: Dict[str, Dict[str, str]], queries: Dict[str, str],
               top_k: int, **kw) -> Dict[str, Dict[str, float]]:
        qids = list(queries.keys())
        q_emb = np.asarray(self.model.encode_queries([queries[q] for q in qids]))
        if self.score_function == "cos_sim":
            q_emb = np.asarray(normalize(jnp.asarray(q_emb)))

        # Longest-documents-first ordering (exact_search.py:64-71): the worst
        # padding cases batch together and OOM surfaces immediately, not at hour 3.
        doc_ids = sorted(
            corpus, key=lambda d: len(corpus[d].get("title", "") + corpus[d].get("text", "")),
            reverse=True)

        Q = len(qids)
        k = min(top_k + 1, len(doc_ids))  # +1: reference drops self-hits for queries in corpus
        run_vals = np.full((Q, k), -np.inf, np.float32)
        run_idx = np.zeros((Q, k), np.int64)

        for start in range(0, len(doc_ids), self.corpus_chunk_size):
            chunk_ids = doc_ids[start : start + self.corpus_chunk_size]
            logger.info("Encoding corpus chunk %d..%d / %d", start,
                        start + len(chunk_ids), len(doc_ids))
            c_emb = np.asarray(self.model.encode_corpus([corpus[d] for d in chunk_ids]))
            if self.score_function == "cos_sim":
                c_emb = np.asarray(normalize(jnp.asarray(c_emb)))

            n = c_emb.shape[0]
            # pad to a device_chunk multiple so the slab scan actually tiles
            n_pad = _round_up(n, min(self.device_chunk, _round_up(n, 128)))
            pad = np.zeros((n_pad, c_emb.shape[1]), c_emb.dtype)
            pad[:n] = c_emb
            # block-max candidate filtering: exact top-k at matmul speed
            # (ops/topk.blockmax_topk; replaces the reference's torch.topk+heapq)
            vals, idx = jax.device_get(   # one batched D2H fetch, not two
                blockmax_topk(jnp.asarray(q_emb), jnp.asarray(pad), n,
                              k=min(k, n_pad), block_size=128,
                              slab_size=self.device_chunk))
            vals, idx = vals, idx.astype(np.int64) + start
            if vals.shape[1] < k:  # corpus chunk smaller than k
                fill = np.full((Q, k - vals.shape[1]), -np.inf, np.float32)
                vals = np.concatenate([vals, fill], axis=1)
                idx = np.concatenate([idx, np.zeros_like(idx[:, : k - idx.shape[1]])], axis=1)
            # merge running top-k (host; arrays are (Q, k) — tiny)
            allv = np.concatenate([run_vals, vals], axis=1)
            alli = np.concatenate([run_idx, idx], axis=1)
            sel = np.argsort(-allv, axis=1, kind="stable")[:, :k]
            run_vals = np.take_along_axis(allv, sel, axis=1)
            run_idx = np.take_along_axis(alli, sel, axis=1)

        results: Dict[str, Dict[str, float]] = {}
        for qi, qid in enumerate(qids):
            hits = {}
            for v, di in zip(run_vals[qi], run_idx[qi]):
                if not np.isfinite(v):
                    continue
                doc_id = doc_ids[int(di)]
                if doc_id == qid:  # drop self-retrieval (exact_search.py:125)
                    continue
                hits[doc_id] = float(v)
            results[qid] = dict(list(hits.items())[:top_k])
        return results
