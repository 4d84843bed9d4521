"""Embedding-space search utilities.

Numpy/JAX equivalents of the ST fork's utility surface
(sentence_transformers/util.py): `semantic_search` (:197-259),
`paraphrase_mining_embeddings` (:140-195), `community_detection` (:385-440).
Same output shapes so downstream code ports unchanged; scoring runs through the
device top-k ops.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .similarity import cos_sim
from .topk import blockmax_topk
from .pooling import normalize


def _as_np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def semantic_search(query_embeddings, corpus_embeddings, *, top_k: int = 10,
                    score_function: str = "cos_sim",
                    query_chunk_size: int = 1024) -> List[List[Dict]]:
    """[[{'corpus_id': i, 'score': s}, ...] per query], sorted desc."""
    q = _as_np(query_embeddings)
    c = _as_np(corpus_embeddings)
    if q.ndim == 1:
        q = q[None]
    if score_function == "cos_sim":
        q = np.asarray(normalize(jnp.asarray(q)))
        c = np.asarray(normalize(jnp.asarray(c)))
    elif score_function != "dot":
        # a typo'd name silently meant "dot" before — rankings quietly
        # diverged from cosine for non-unit embeddings
        raise ValueError(f"unknown score_function {score_function!r}; "
                         "use 'cos_sim' or 'dot'")
    n = c.shape[0]
    n_pad = ((n + 127) // 128) * 128
    c_pad = np.zeros((n_pad, c.shape[1]), c.dtype)
    c_pad[:n] = c
    c_dev = jnp.asarray(c_pad)   # ONE host->device transfer, not per chunk
    out: List[List[Dict]] = []
    k = min(top_k, n)
    for s in range(0, len(q), query_chunk_size):
        vals, idx = jax.device_get(    # one batched D2H fetch per chunk
            blockmax_topk(jnp.asarray(q[s : s + query_chunk_size]),
                          c_dev, n, k=k))
        for vrow, irow in zip(vals, idx):
            out.append([{"corpus_id": int(i), "score": float(v)}
                        for v, i in zip(vrow, irow)])
    return out


def paraphrase_mining_embeddings(embeddings, *, top_k: int = 100,
                                 max_pairs: int = 500000) -> List[List]:
    """[[score, id1, id2], ...] best-first, self/duplicate pairs removed."""
    emb = _as_np(embeddings)
    hits = semantic_search(emb, emb, top_k=min(top_k + 1, len(emb)))
    pairs = {}
    for i, row in enumerate(hits):
        for h in row:
            j = h["corpus_id"]
            if i == j:
                continue
            key = (min(i, j), max(i, j))
            if key not in pairs or h["score"] > pairs[key]:
                pairs[key] = h["score"]
    ranked = sorted(pairs.items(), key=lambda kv: -kv[1])[:max_pairs]
    return [[score, a, b] for (a, b), score in ranked]


def community_detection(embeddings, *, threshold: float = 0.75,
                        min_community_size: int = 10,
                        init_max_size: int = 1000) -> List[List[int]]:
    """Fast community detection: greedy clusters of mutually-close embeddings,
    largest first, first element = the community's central point."""
    emb = _as_np(embeddings)
    n = len(emb)
    scores = np.asarray(cos_sim(jnp.asarray(emb), jnp.asarray(emb)))

    k = min(min_community_size, n)
    kth = np.sort(scores, axis=1)[:, -k]
    candidates = np.where(kth >= threshold)[0]

    extracted = []
    for i in candidates:
        members = np.where(scores[i] >= threshold)[0]
        order = np.argsort(-scores[i][members])
        extracted.append([int(m) for m in members[order]][:max(init_max_size, k)])

    extracted.sort(key=len, reverse=True)
    unique: List[List[int]] = []
    seen: set = set()
    for comm in extracted:
        if any(idx in seen for idx in comm):
            continue
        unique.append(comm)
        seen.update(comm)
    return [c for c in unique if len(c) >= min_community_size]
