"""Approximate MIPS: balanced IVF index — the serving-latency lever past the
exact scan.

No reference counterpart (the reference's only search is brute force:
biencoder/beir/custommodels/exact_search.py:80-132). The exact `DenseIndex`
scan is bandwidth-bound — 10M int8 docs ≈ 7.7 GB of HBM per query *batch* —
which is optimal for large batched sweeps (BEIR evaluation) but pays the full
corpus read even for a single interactive query. IVF reads only the probed
clusters: nprobe=32 of 4096 clusters ≈ 1% of the corpus per query.

TPU-first design — everything static-shaped and matmul-dominated:
  * spherical k-means ON DEVICE: assignment is one (N, D) @ (D, K) matmul per
    Lloyd iteration (slab-scanned via lax.map to bound memory), update is a
    segment-sum; centroids re-normalize each iteration.
  * BALANCED layout: clusters pad to ONE common size C_pad (a multiple of 8),
    so the corpus becomes a dense (K, C_pad, D) block array — no ragged
    cluster lists, no data-dependent shapes, XLA tiles the probe matmul onto
    the MXU. Docs beyond C_pad in an oversized cluster spill to an OVERFLOW
    slab that every search scans exactly — imbalance costs a little
    bandwidth, never recall-by-omission.
  * search: queries @ centroidsᵀ → top-nprobe cluster ids → gather those
    (nprobe, C_pad, D) blocks → one einsum → top-k over the probed union →
    merge with the exact overflow scan. Per query batch the HBM read is
    Q·nprobe·C_pad·D bytes instead of N·D.
  * int8 option: blocks store per-row symmetric int8 + fp32 scales (same
    scheme as DenseIndex quantize="int8", index.py) — half the gathered
    bytes; scores dequantize in-register.

`add` after `build()` stages into a pending slab scanned exactly until the
next build() re-clusters — the same serve-while-growing contract as
DenseIndex, so `SearchService` (serving.py) takes either index unchanged.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.pooling import normalize
from .ops.topk import blockmax_topk

logger = logging.getLogger(__name__)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@partial(jax.jit, static_argnames=("n_clusters", "iters", "slab"))
def _kmeans(corpus: jax.Array, valid: jax.Array, seed_idx: jax.Array,
            n_clusters: int, iters: int, slab: int) -> jax.Array:
    """Spherical k-means; returns L2-normalized centroids (K, D) fp32.

    corpus: (N_pad, D) fp32, pre-normalized rows, N_pad a multiple of `slab`;
    valid: (N_pad,) fp32 1/0 mask (pad rows must not pull any centroid).
    seed_idx: (K,) initial centroid row indices.
    """
    cent = normalize(corpus[seed_idx])

    def assign(cent):
        def one_slab(s):
            return jnp.argmax(s @ cent.T, axis=1).astype(jnp.int32)
        return jax.lax.map(one_slab,
                           corpus.reshape(-1, slab, corpus.shape[1])).reshape(-1)

    def step(cent, _):
        a = assign(cent)
        sums = jax.ops.segment_sum(corpus * valid[:, None], a,
                                   num_segments=n_clusters)
        counts = jax.ops.segment_sum(valid, a, num_segments=n_clusters)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # empty cluster keeps its old centroid (stays available for later)
        new = jnp.where(counts[:, None] > 0, new, cent)
        return normalize(new), None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    return cent


@partial(jax.jit, static_argnames=("k", "nprobe", "quantized"))
def _probe_search(q, centroids, blocks, block_ids, scales, k: int,
                  nprobe: int, quantized: bool):
    """q: (Q, D) fp32 → (scores (Q,k), positions (Q,k)) over probed clusters.

    blocks: (K, C_pad, D); block_ids: (K, C_pad) int32, -1 = pad slot;
    scales: (K, C_pad) fp32 when quantized.
    """
    probe = jax.lax.top_k(q @ centroids.T, nprobe)[1]          # (Q, P)
    g = jnp.take(blocks, probe, axis=0)                        # (Q, P, C, D)
    gid = jnp.take(block_ids, probe, axis=0)                   # (Q, P, C)
    if quantized:
        scores = jnp.einsum("qd,qpcd->qpc", q.astype(jnp.bfloat16),
                            g.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        scores = scores * jnp.take(scales, probe, axis=0)
    else:
        scores = jnp.einsum("qd,qpcd->qpc", q.astype(blocks.dtype), g,
                            preferred_element_type=jnp.float32)
    scores = jnp.where(gid < 0, -jnp.inf, scores)
    Q = q.shape[0]
    flat = scores.reshape(Q, -1)
    top_vals, pos = jax.lax.top_k(flat, k)
    top_ids = jnp.take_along_axis(gid.reshape(Q, -1), pos, axis=1)
    return top_vals, top_ids


class IVFIndex:
    """Balanced IVF-flat approximate index (duck-type compatible with
    DenseIndex: add / build / search_embeddings / __len__ / pending_docs)."""

    def __init__(self, dim: int, *, n_clusters: int = 1024,
                 normalize_embeddings: bool = True, pad_factor: float = 1.5,
                 kmeans_iters: int = 10, train_slab: int = 1 << 17,
                 nprobe: int = 32, seed: int = 0,
                 dtype=jnp.bfloat16, quantize: Optional[str] = None,
                 block_size: int = 128):
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        self.dim = dim
        self.n_clusters = n_clusters
        self.normalize = normalize_embeddings
        self.pad_factor = pad_factor
        self.kmeans_iters = kmeans_iters
        self.train_slab = train_slab
        self.nprobe = nprobe
        self.seed = seed
        self.dtype = dtype
        self.quantize = quantize
        self.block_size = block_size   # pending/overflow slab granularity
        self._chunks: List[np.ndarray] = []
        self._ids: List[str] = []
        self._count = 0
        self._built_count = 0
        # device state after build()
        self._centroids = None
        self._blocks = None
        self._block_ids = None
        self._scales = None
        self._overflow = None          # (M_pad, D) exact-scanned remainder
        self._overflow_scales = None
        self._overflow_ids = None      # (M_pad,) int32 positions, -1 pad
        self._overflow_count = 0
        # post-build adds (exact-scanned pending slab, like DenseIndex)
        self._pending_arr = None
        self._pending_scales = None
        self._pending_count = 0
        self._pending_dirty = False

    # ------------------------------------------------------------------
    def add(self, embeddings, ids: Optional[Sequence[str]] = None):
        emb = np.asarray(embeddings, np.float32)
        if emb.ndim != 2 or emb.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) embeddings, "
                             f"got {emb.shape}")
        if self.normalize:
            emb = emb / np.clip(np.linalg.norm(emb, axis=1, keepdims=True),
                                1e-12, None)
        start = self._count
        self._chunks.append(emb)
        self._ids.extend(ids if ids is not None
                         else (str(start + i) for i in range(emb.shape[0])))
        self._count += emb.shape[0]
        if self._blocks is not None:
            self._pending_dirty = True

    def __len__(self) -> int:
        return self._count

    @property
    def is_built(self) -> bool:
        return self._blocks is not None

    @property
    def pending_docs(self) -> int:
        return self._count - self._built_count

    # ------------------------------------------------------------------
    def _quantize_rows(self, emb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        scale = np.clip(np.abs(emb).max(axis=-1), 1e-12, None) / 127.0
        q = np.round(emb / scale[..., None]).astype(np.int8)
        return q, scale.astype(np.float32)

    def build(self):
        """(Re-)cluster everything (built + pending) into the block layout."""
        if not self._chunks and self._blocks is None:
            raise RuntimeError("build() on an empty index")
        chunks = list(self._chunks)
        if self._blocks is not None and chunks:
            chunks.insert(0, self._rebuild_host_corpus())
        if chunks:
            corpus = np.concatenate(chunks, axis=0)
        else:
            return self  # built, nothing pending
        n, d = corpus.shape
        K = min(self.n_clusters, n)

        # ---- train + assign on device (fp32; slab-scanned matmuls) ----
        slab = min(self.train_slab, _round_up(n, 8))
        n_pad = _round_up(n, slab)
        corpus_pad = np.zeros((n_pad, d), np.float32)
        corpus_pad[:n] = corpus
        dev = jnp.asarray(corpus_pad)
        valid = jnp.asarray((np.arange(n_pad) < n).astype(np.float32))
        rng = np.random.default_rng(self.seed)
        seed_idx = jnp.asarray(rng.choice(n, size=K, replace=False), jnp.int32)
        cent = _kmeans(dev, valid, seed_idx, K, self.kmeans_iters, slab)
        assign = np.asarray(
            jax.lax.map(lambda s: jnp.argmax(s @ cent.T, axis=1),
                        dev.reshape(-1, slab, d)).reshape(-1)[:n])
        del dev

        # ---- balanced block layout ----
        order = np.argsort(assign, kind="stable")
        sizes = np.bincount(assign, minlength=K)
        c_pad = max(_round_up(int(self.pad_factor * max(1, n // K)), 8), 8)
        blocks = np.zeros((K, c_pad, d), np.float32)
        block_ids = np.full((K, c_pad), -1, np.int32)
        overflow_rows, overflow_ids = [], []
        pos = 0
        for c in range(K):
            members = order[pos:pos + sizes[c]]
            pos += sizes[c]
            take = members[:c_pad]
            blocks[c, :len(take)] = corpus[take]
            block_ids[c, :len(take)] = take
            if len(members) > c_pad:   # spill: scanned exactly, never dropped
                overflow_rows.append(corpus[members[c_pad:]])
                overflow_ids.append(members[c_pad:])
        m = sum(len(o) for o in overflow_ids)
        if m:
            logger.info("IVF overflow: %d/%d docs (%.1f%%) spill past "
                        "C_pad=%d; they are exact-scanned each search",
                        m, n, 100.0 * m / n, c_pad)

        self._centroids = cent
        self._block_ids = jnp.asarray(block_ids)
        if self.quantize == "int8":
            q, s = self._quantize_rows(blocks)
            s = np.where(block_ids < 0, 0.0, s)   # pad rows score exactly 0
            self._blocks = jnp.asarray(q)
            self._scales = jnp.asarray(s)
        else:
            self._blocks = jnp.asarray(blocks, self.dtype)
            self._scales = None
        m_pad = _round_up(max(m, 1), self.block_size)
        ov = np.zeros((m_pad, d), np.float32)
        ov_ids = np.full((m_pad,), -1, np.int32)
        if m:
            ov[:m] = np.concatenate(overflow_rows)
            ov_ids[:m] = np.concatenate(overflow_ids)
        if self.quantize == "int8":
            qo, so = self._quantize_rows(ov)
            self._overflow = jnp.asarray(qo)
            self._overflow_scales = jnp.asarray(so)
        else:
            self._overflow = jnp.asarray(ov, self.dtype)
            self._overflow_scales = None
        self._overflow_ids = ov_ids
        self._overflow_count = m
        self._built_count = n
        self._chunks, self._pending_arr = [], None
        self._pending_count, self._pending_dirty = 0, False
        return self

    def _rebuild_host_corpus(self) -> np.ndarray:
        """Fetch the built corpus back to host fp32 for a merge rebuild."""
        blocks = np.asarray(self._blocks, np.float32)
        if self.quantize == "int8":
            blocks = blocks * np.asarray(self._scales)[..., None]
        flat_ids = np.asarray(self._block_ids).reshape(-1)
        flat = blocks.reshape(-1, self.dim)
        ov = np.asarray(self._overflow, np.float32)
        if self.quantize == "int8":
            ov = ov * np.asarray(self._overflow_scales)[:, None]
        out = np.zeros((self._built_count, self.dim), np.float32)
        out[flat_ids[flat_ids >= 0]] = flat[flat_ids >= 0]
        keep = self._overflow_ids >= 0
        out[self._overflow_ids[keep]] = ov[keep]
        return out

    # ------------------------------------------------------------------
    def _scan_slab(self, qd, arr, scales, count, k):
        vals, idx = blockmax_topk(qd, arr, count, k=k,
                                  block_size=self.block_size,
                                  corpus_scale=scales)
        return np.asarray(vals, np.float32), np.asarray(idx)

    def _search_pending(self, qd, k: int):
        if self._pending_arr is None or self._pending_dirty:
            pend = np.concatenate(self._chunks, axis=0)
            n = pend.shape[0]
            blocks = -(-n // self.block_size)
            n_pad = self.block_size * (1 << max(0, (blocks - 1).bit_length()))
            padded = np.zeros((n_pad, self.dim), np.float32)
            padded[:n] = pend
            if self.quantize == "int8":
                q, s = self._quantize_rows(padded)
                self._pending_arr = jnp.asarray(q)
                self._pending_scales = jnp.asarray(
                    np.where(np.arange(n_pad) < n, s, 1.0).astype(np.float32))
            else:
                self._pending_arr = jnp.asarray(padded, self.dtype)
                self._pending_scales = None
            self._pending_count = n
            self._pending_dirty = False
        # clamp AFTER the lazy refresh above — _pending_count is stale (even
        # zero) until then, and a k clamped against the stale value would
        # silently drop every pending hit
        return self._scan_slab(qd, self._pending_arr, self._pending_scales,
                               self._pending_count,
                               min(k, self._pending_count))

    def search_embeddings(self, query_embeddings, k: int = 10, *,
                          nprobe: Optional[int] = None, qchunk: int = 16
                          ) -> Tuple[List[np.ndarray], List[List[str]]]:
        """Same ragged contract as DenseIndex.search_embeddings: (per-query
        score arrays, per-query id lists). qchunk bounds the gathered-block
        memory (Q·nprobe·C_pad·D per chunk)."""
        q = np.asarray(query_embeddings, np.float32)
        if self._blocks is None:
            if self._chunks:
                raise RuntimeError(
                    "search before build(): added embeddings are still "
                    "pending — call build() first")
            return ([np.zeros((0,), np.float32) for _ in q], [[] for _ in q])
        if self.normalize:
            q = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True),
                            1e-12, None)
        nprobe = min(nprobe or self.nprobe, int(self._centroids.shape[0]))
        k_eff = min(k, self._count)
        kc = min(k_eff, nprobe * int(self._blocks.shape[1]))

        vals_l, ids_l = [], []
        for s in range(0, q.shape[0], qchunk):
            qs = jnp.asarray(q[s:s + qchunk])
            tv, ti = _probe_search(qs, self._centroids, self._blocks,
                                   self._block_ids, self._scales, kc, nprobe,
                                   self.quantize == "int8")
            tv, ti = np.asarray(tv, np.float32), np.asarray(ti)
            if self._overflow_count:
                ov, oi = self._scan_slab(qs, self._overflow,
                                         self._overflow_scales,
                                         self._overflow_count,
                                         min(k_eff, self._overflow_count))
                oi = self._overflow_ids[oi]   # -1 pad ids drop via `finite`
                tv = np.concatenate([tv, ov], axis=1)
                ti = np.concatenate([ti, oi], axis=1)
            if self._chunks:
                pv, pi = self._search_pending(qs, k_eff)
                tv = np.concatenate([tv, pv], axis=1)
                ti = np.concatenate([ti, pi + self._built_count], axis=1)
            ord_ = np.argsort(-tv, axis=1, kind="stable")[:, :k_eff]
            vals_l.append(np.take_along_axis(tv, ord_, axis=1))
            ids_l.append(np.take_along_axis(ti, ord_, axis=1))
        vals = np.concatenate(vals_l, axis=0)
        idx = np.concatenate(ids_l, axis=0)
        finite = (vals > -1e29) & (idx >= 0)
        ids = [[self._ids[int(i)] for i, ok in zip(row_i, row_f) if ok]
               for row_i, row_f in zip(idx, finite)]
        return ([row_v[row_f] for row_v, row_f in zip(vals, finite)], ids)
