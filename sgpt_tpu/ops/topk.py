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

NEG = float("-inf")  # python float: a jnp scalar here would CREATE a
# device array at import time and grab/initialize the default backend
# (single-client TPU relay!) before the caller can pick a platform


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


@partial(jax.jit, static_argnames=("k", "block_size", "slab_size"))
def blockmax_topk(queries: jax.Array, corpus: jax.Array, valid_count,
                  k: int = 100, block_size: int = 128,
                  slab_size: int = 1 << 20, corpus_scale=None, row_mask=None):
    """Exact top-k MIPS via block-max candidate filtering — the fast path.

    Why: per-chunk `lax.top_k` over the full score matrix (chunked_topk) costs
    ~500x the matmul at k=100 on TPU. Here each corpus slab is scored with one
    dense matmul (MXU-bound), reduced to per-block maxima, and only the k
    highest-max blocks are rescored:

      1. scores = Q @ slab.T                       (Q, S)   — full MFU
      2. block maxima  max over blocks of B docs   (Q, S/B)
      3. top-k blocks by max                        (Q, kb)  — small top_k
      4. gather those blocks' scores → final top_k  (Q, kb*B → k)

    Exactness: a doc in the true top-k has score >= theta (the k-th best); its
    block's max >= theta, and any block ranked above it contributes a doc
    scoring above that — so >k better docs would exist, contradiction. Hence
    the k best blocks always cover the true top-k (modulo score ties).

    queries: (Q, D); corpus: (N, D), N % slab or N <= slab handled by padding
    to a multiple of block_size. Rows >= valid_count are masked.

    corpus_scale: optional (N,) fp32 per-row dequantization scales for an
    int8-quantized corpus (DenseIndex quantize="int8"): HALF the HBM scan
    traffic (the bottleneck at serving scale). The slab matmul upcasts the
    int8 tile to bf16 in-register and runs a bf16 matmul against the (bf16)
    queries, then applies the fp32 row scales — measured 280 GB/s effective
    on v5e vs 28 GB/s for the "native" int8×int8→int32 einsum (XLA's int8
    dot path is ~10x off bandwidth at retrieval shapes) and vs 57 GB/s/byte
    ≈ half the doc rate for the bf16-corpus path. Queries stay float (only
    the corpus is quantized), so recall is strictly better than symmetric
    int8×int8. The exactness argument applies to the dequantized scores
    unchanged.

    row_mask: optional (N,) bool — False rows score -inf (tombstoned
    deletions, DenseIndex.delete). Masking happens BEFORE the block-max
    filter, so exactness over the live rows is unchanged; the (N,) read is
    negligible next to the (N, D) corpus scan.
    """
    Q, D = queries.shape
    N = corpus.shape[0]
    assert N % block_size == 0, "pad corpus to a multiple of block_size"
    slab_size = min(slab_size, N)
    # coerce the slab to a whole number of blocks (callers pass slab budgets
    # in docs, not blocks — a slab < block or mid-block slab would break the
    # (Q, blocks, block) reshape below; found by property fuzz)
    slab_size = max(block_size, slab_size - slab_size % block_size)
    if N % slab_size:  # fall back to one slab if N doesn't tile evenly
        slab_size = N
    n_slabs = N // slab_size
    blocks_per_slab = slab_size // block_size
    kb = min(k, blocks_per_slab)
    slabs = corpus.reshape(n_slabs, slab_size, D)

    if corpus_scale is not None:
        assert corpus.dtype == jnp.int8, "corpus_scale implies an int8 corpus"
        scale_slabs = corpus_scale.reshape(n_slabs, slab_size)
        q_bf = queries.astype(jnp.bfloat16)
    if row_mask is not None:
        mask_slabs = row_mask.reshape(n_slabs, slab_size)

    def slab_topk(slab, base, scale=None, mask=None):
        if corpus_scale is None:
            scores = jnp.einsum("qd,cd->qc", queries, slab,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        else:
            scores = jnp.einsum("qd,cd->qc", q_bf, slab.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
            scores = scores * scale[None, :]
        col = base + jnp.arange(slab_size, dtype=jnp.int32)
        scores = jnp.where(col[None, :] < valid_count, scores, NEG)
        if mask is not None:
            scores = jnp.where(mask[None, :], scores, NEG)

        tiled = scores.reshape(Q, blocks_per_slab, block_size)
        blockmax = jnp.max(tiled, axis=2)                       # (Q, S/B)
        _, blk_idx = jax.lax.top_k(blockmax, kb)                # (Q, kb)
        cand = jnp.take_along_axis(tiled, blk_idx[:, :, None], axis=1)
        cand = cand.reshape(Q, kb * block_size)
        kk = min(k, kb * block_size)
        c_vals, c_pos = jax.lax.top_k(cand, kk)                 # (Q, kk)
        # flat position → doc index within slab
        c_blk = jnp.take_along_axis(blk_idx, c_pos // block_size, axis=1)
        c_doc = base + c_blk * block_size + c_pos % block_size
        return c_vals, c_doc.astype(jnp.int32)

    if n_slabs == 1:
        # no scan: also keeps this callable inside shard_map, whose varying-
        # axis rules reject a replicated scan carry meeting shard-varying data
        vals, idx = slab_topk(slabs[0], jnp.int32(0),
                              None if corpus_scale is None else scale_slabs[0],
                              None if row_mask is None else mask_slabs[0])
        if vals.shape[1] < k:
            pad_v = jnp.full((Q, k - vals.shape[1]), NEG, jnp.float32)
            pad_i = jnp.zeros((Q, k - idx.shape[1]), jnp.int32)
            vals = jnp.concatenate([vals, pad_v], axis=1)
            idx = jnp.concatenate([idx, pad_i], axis=1)
        return vals, idx

    init = (jnp.full((Q, k), NEG, jnp.float32), jnp.zeros((Q, k), jnp.int32))

    def step(carry, inp):
        run_vals, run_idx = carry
        c_vals, c_doc = slab_topk(inp["slab"], inp["i"] * slab_size,
                                  inp.get("scale"), inp.get("mask"))
        return merge_topk(run_vals, run_idx, c_vals, c_doc, k), None

    xs = {"i": jnp.arange(n_slabs, dtype=jnp.int32), "slab": slabs}
    if corpus_scale is not None:
        xs["scale"] = scale_slabs
    if row_mask is not None:
        xs["mask"] = mask_slabs
    (vals, idx), _ = jax.lax.scan(step, init, xs)
    return vals, idx
