"""On-device chunked brute-force top-k retrieval.

TPU-native replacement for the reference's exact search
(biencoder/beir/custommodels/exact_search.py:80-132: per-chunk torch.topk +
host-side heapq prune). Here the whole scan — score matmul, per-chunk top-k,
running merge — stays on device under one jit: `lax.scan` over corpus tiles,
merging a running (k) buffer per query with each tile's top-k. O(Q·k) memory,
zero host round-trips.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = jnp.float32(-jnp.inf)


def merge_topk(vals_a, idx_a, vals_b, idx_b, k: int):
    """Merge two (Q, ka|kb) candidate sets into the top-k union."""
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    top_vals, pos = jax.lax.top_k(vals, k)
    return top_vals, jnp.take_along_axis(idx, pos, axis=-1)


@partial(jax.jit, static_argnames=("k", "chunk_size", "normalized"))
def chunked_topk(queries: jax.Array, corpus: jax.Array, valid_count,
                 k: int = 10, chunk_size: int = 4096, normalized: bool = True):
    """Top-k inner-product (or cosine, if inputs are pre-normalized) search.

    queries: (Q, D); corpus: (N, D) with N a multiple of chunk_size (pad rows
    beyond `valid_count` are masked out). Returns (scores (Q,k), indices (Q,k)).
    """
    del normalized  # cosine == dot on pre-normalized inputs; kept for clarity
    Q = queries.shape[0]
    N = corpus.shape[0]
    assert N % chunk_size == 0, "pad corpus to a multiple of chunk_size"
    n_chunks = N // chunk_size
    tiles = corpus.reshape(n_chunks, chunk_size, -1)

    init_vals = jnp.full((Q, k), NEG, jnp.float32)
    init_idx = jnp.zeros((Q, k), jnp.int32)

    def step(carry, inp):
        run_vals, run_idx = carry
        chunk_i, tile = inp
        base = chunk_i * chunk_size
        scores = jnp.einsum("qd,cd->qc", queries, tile,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)
        col = base + jnp.arange(chunk_size, dtype=jnp.int32)
        scores = jnp.where(col[None, :] < valid_count, scores, NEG)
        kk = min(k, chunk_size)
        t_vals, t_idx = jax.lax.top_k(scores, kk)
        run_vals, run_idx = merge_topk(run_vals, run_idx, t_vals,
                                       (base + t_idx).astype(jnp.int32), k)
        return (run_vals, run_idx), None

    (vals, idx), _ = jax.lax.scan(
        step, (init_vals, init_idx),
        (jnp.arange(n_chunks, dtype=jnp.int32), tiles))
    return vals, idx
