"""Approximate MIPS: balanced IVF index — the serving-latency lever past the
exact scan.

No reference counterpart (the reference's only search is brute force:
biencoder/beir/custommodels/exact_search.py:80-132). The exact `DenseIndex`
scan is bandwidth-bound — 10M int8 docs ≈ 7.7 GB of HBM per query *batch* —
which is optimal for large batched sweeps (BEIR evaluation) but pays the full
corpus read even for a single interactive query. IVF reads only the probed
clusters: nprobe=32 of 16384 clusters ≈ 0.2% of the corpus per query.

TPU-first design — everything static-shaped and matmul-dominated:
  * spherical k-means ON DEVICE over a TRAINING SAMPLE (≤ max_train_rows;
    the standard IVF recipe — centroid quality saturates long before the
    full corpus): assignment is one (S, D) @ (D, K) matmul per Lloyd
    iteration (slab-scanned via lax.map to bound the score tile), update is
    a segment-sum; centroids re-normalize each iteration.
  * full-corpus assignment STREAMS host→device in bounded chunks (the
    corpus never needs to fit HBM in fp32 — that cap is what kept the first
    cut of this index at ~1M docs), scoring sub-slabs under lax.map so the
    (rows, K) score tile stays ~1 GB regardless of corpus size.
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
  * int8 option: rows quantize at add() time (per-row symmetric int8 + fp32
    scales — same scheme as DenseIndex quantize="int8", index.py) and stay
    int8 verbatim through build/rebuild (no accumulating re-quantization
    error); host memory and gathered bytes both drop 4×/2×.

`add` after `build()` stages into a pending slab scanned exactly until the
next build() re-clusters — the same serve-while-growing contract as
DenseIndex, so `SearchService` (serving.py) takes either index unchanged.

Choosing K (n_clusters) — measured lesson (docs/PERF.md, 10M-doc bench):
pure N/K sizing heuristics (e.g. K ≈ N/600) can badly overshoot a corpus
whose natural topic count is smaller — k-means then splits real clusters
into fragments below the balance threshold, a large fraction of the corpus
spills to overflow (38% at K=16384 over a 4096-topic 10M corpus), and the
"probe" degenerates into a half-corpus exact scan (flat latency/recall
across nprobe is the tell-tale).

`n_clusters="auto"` (the default answer to that footgun) sweeps candidate K
values on the SAME training sample k-means already uses: a short k-means +
one sample assignment per candidate estimates each K's overflow fraction
(sample counts scaled to corpus size against the real C_pad formula), and
the sweep picks the LARGEST K whose estimate stays under
`auto_overflow_target` (10%) — i.e. the knee where k-means stops matching
the corpus's natural granularity. Probe bytes per query scale as
nprobe·C_pad·D ∝ nprobe/K, so the largest non-overflowing K is also the
fastest probe. build() additionally warns LOUDLY whenever the realized
overflow exceeds the target, with the sweep as the suggested fix —
regardless of how K was chosen.
"""
from __future__ import annotations

import logging
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .index import _compact_deleted, _decode_ids, _encode_ids
from .ops.pooling import normalize
from .ops.topk import blockmax_topk

logger = logging.getLogger(__name__)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@partial(jax.jit, static_argnames=("n_clusters", "iters", "slab"))
def _kmeans(corpus: jax.Array, valid: jax.Array, seed_idx: jax.Array,
            n_clusters: int, iters: int, slab: int) -> jax.Array:
    """Spherical k-means; returns L2-normalized centroids (K, D) fp32.

    corpus: (S_pad, D) fp32, pre-normalized rows, S_pad a multiple of `slab`;
    valid: (S_pad,) fp32 1/0 mask (pad rows must not pull any centroid).
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


@partial(jax.jit, static_argnames=("slab",))
def _assign_corpus(rows: jax.Array, cent: jax.Array, slab: int) -> jax.Array:
    """Nearest-centroid ids for a corpus chunk, (R_pad,) int32.

    rows: (R_pad, D) int8 (quantized) or fp32, R_pad a multiple of `slab`.
    Scores compute in bf16 (assignment only needs an argmax; per-row int8
    scales are positive and uniform across a row's centroid scores, so
    dequantization cannot change the argmax and is skipped); the (slab, K)
    score tile is the only large transient.
    """
    cent_t = cent.astype(jnp.bfloat16).T

    def one_slab(s):
        return jnp.argmax(s.astype(jnp.bfloat16) @ cent_t,
                          axis=1).astype(jnp.int32)

    return jax.lax.map(one_slab,
                       rows.reshape(-1, slab, rows.shape[1])).reshape(-1)


def _score_probed(q, probe, blocks, block_ids, scales, k: int,
                  nprobe: int, quantized: bool):
    """Score the probed blocks → (scores (Q,k), positions (Q,k)).

    Shared by the single-device and per-shard (mesh) probe paths so the two
    can never diverge. blocks: (K, C_pad, D); block_ids: (K, C_pad) int32,
    -1 = pad slot OR tombstoned deletion; scales: (K, C_pad) fp32 when
    quantized.

    The probed blocks are fetched one dynamic_index_in_dim slice at a time
    under lax.map — NOT jnp.take: XLA lowers a big-slice leading-axis gather
    to a one-hot matmul that reads the ENTIRE (K, C_pad, D) table, which
    measured exactly as slow as the exact scan (the whole point of IVF is to
    read nprobe/K of the corpus; dynamic slices are true DMAs of just the
    probed clusters).
    """
    Q = q.shape[0]
    qc = q.astype(jnp.bfloat16 if quantized else blocks.dtype)
    # each (query, probe) pair scores one (C_pad, D) block against its query
    flat_probe = probe.reshape(-1)                             # (Q*P,)
    q_for = jnp.repeat(qc, nprobe, axis=0)                     # (Q*P, D)

    def score_one(args):
        c, qv = args
        blk = jax.lax.dynamic_index_in_dim(blocks, c, 0, keepdims=False)
        ids = jax.lax.dynamic_index_in_dim(block_ids, c, 0, keepdims=False)
        s = jnp.einsum("cd,d->c", blk.astype(qv.dtype), qv,
                       preferred_element_type=jnp.float32)
        if quantized:
            s = s * jax.lax.dynamic_index_in_dim(scales, c, 0, keepdims=False)
        return jnp.where(ids < 0, -jnp.inf, s), ids

    scores, gid = jax.lax.map(score_one, (flat_probe, q_for))  # (Q*P, C)
    top_vals, pos = jax.lax.top_k(scores.reshape(Q, -1), k)
    top_ids = jnp.take_along_axis(gid.reshape(Q, -1), pos, axis=1)
    return top_vals, top_ids


@partial(jax.jit, static_argnames=("k", "nprobe", "quantized"))
def _probe_search(q, centroids, blocks, block_ids, scales, k: int,
                  nprobe: int, quantized: bool):
    """Single-device probe: global top-nprobe clusters, then _score_probed."""
    probe = jax.lax.top_k(q @ centroids.T, nprobe)[1]          # (Q, P)
    return _score_probed(q, probe, blocks, block_ids, scales, k,
                         nprobe, quantized)


@partial(jax.jit, static_argnames=("k", "k_ov", "nprobe", "quantized",
                                   "block_size"))
def _probe_overflow_search(q, centroids, blocks, block_ids, scales,
                           ov, ov_scales, ov_ids, ov_count, k: int, k_ov: int,
                           nprobe: int, quantized: bool, block_size: int):
    """Probe + overflow exact scan + candidate merge fused into ONE dispatch
    with TWO output arrays. The dev relay charges ~30 ms per dispatch AND
    ~30 ms per D2H array fetch (measured; jax.device_get batches a pytree
    into one fetch) — the unfused path (2 dispatches + 4 per-array fetches)
    cost ~110 ms of pure RPC per single query."""
    tv, ti = _probe_search(q, centroids, blocks, block_ids, scales, k,
                           nprobe, quantized)
    # ov_ids < 0 marks pad slots AND tombstoned deletions: mask them inside
    # the scan so dead rows never consume candidate slots
    ov_v, ov_i = blockmax_topk(q, ov, ov_count, k=k_ov,
                               block_size=block_size, corpus_scale=ov_scales,
                               row_mask=ov_ids >= 0)
    # map overflow row slots → global doc positions; blockmax's -inf filler
    # slots carry row 0, whose mapped id is a REAL doc — their -inf score
    # keeps them out of any top-k that has genuine candidates left, and the
    # host-side `finite` filter drops the rest
    gi = jnp.concatenate([ti, ov_ids[ov_i]], axis=1)
    gv = jnp.concatenate([tv, ov_v], axis=1)
    top_vals, pos = jax.lax.top_k(gv, min(k + k_ov, gv.shape[1]))
    return top_vals, jnp.take_along_axis(gi, pos, axis=1)


def _make_sharded_probe(mesh, k_local: int, k_real: int, quantized: bool,
                        block_size: int, kc: int, k_ov: int,
                        nprobe_local: int, k_final: int):
    """Probe + overflow scan + ICI merge over the mesh's dp axis.

    Cluster blocks are sharded contiguously over dp (cluster c on shard
    c // k_local); each device probes its OWN centroid slice with
    nprobe_local probes and scans its overflow row slice, then per-device
    candidates all_gather and a final top_k picks k_final — the same
    merge shape as DenseIndex's sharded search. Per-device HBM read is
    nprobe_local blocks, so latency divides by dp at equal total probes.
    """
    from jax.sharding import PartitionSpec as P

    def body(q, cent, blocks, bids, *rest):
        rest = list(rest)
        scales = rest.pop(0) if quantized else None
        ov = rest.pop(0)
        ovs = rest.pop(0) if quantized else None
        ovids = rest.pop(0)
        rank = jax.lax.axis_index("dp")
        cs = q @ cent.T                                  # (Q, K/dp)
        gc = rank * k_local + jnp.arange(k_local)
        cs = jnp.where(gc[None, :] < k_real, cs, -jnp.inf)  # pad clusters out
        probe = jax.lax.top_k(cs, nprobe_local)[1]
        tv, ti = _score_probed(q, probe, blocks, bids, scales, kc,
                               nprobe_local, quantized)
        # local overflow slice: row_mask covers pad slots, tombstones AND
        # (when there is no overflow at all) the all -1 placeholder rows
        ov_v, ov_i = blockmax_topk(q, ov, ov.shape[0], k=k_ov,
                                   block_size=block_size, corpus_scale=ovs,
                                   row_mask=ovids >= 0)
        gi = jnp.concatenate([ti, ovids[ov_i]], axis=1)
        gv = jnp.concatenate([tv, ov_v], axis=1)
        all_v = jax.lax.all_gather(gv, "dp", axis=1, tiled=True)
        all_i = jax.lax.all_gather(gi, "dp", axis=1, tiled=True)
        fv, p = jax.lax.top_k(all_v, min(k_final, all_v.shape[1]))
        return fv, jnp.take_along_axis(all_i, p, axis=1)

    in_specs = [P(None, None), P("dp", None), P("dp", None, None),
                P("dp", None)]
    if quantized:
        in_specs.append(P("dp", None))   # block scales
    in_specs.append(P("dp", None))       # overflow rows
    if quantized:
        in_specs.append(P("dp"))         # overflow scales
    in_specs.append(P("dp"))             # overflow ids
    # check_vma off: outputs ARE replicated (same all_gather + top_k on every
    # device) but the varying-axis checker can't infer that
    fn = jax.shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)


class IVFIndex:
    """Balanced IVF-flat approximate index (duck-type compatible with
    DenseIndex: add / build / search_embeddings / __len__ / pending_docs)."""

    def __init__(self, dim: int, *, n_clusters="auto",
                 normalize_embeddings: bool = True, pad_factor: float = 1.5,
                 kmeans_iters: int = 10, train_slab: int = 1 << 15,
                 max_train_rows: int = 1 << 18, assign_chunk: int = 1 << 20,
                 nprobe: int = 32, seed: int = 0,
                 dtype=jnp.bfloat16, quantize: Optional[str] = None,
                 block_size: int = 128, gather_budget: int = 1 << 28,
                 auto_overflow_target: float = 0.10,
                 auto_sweep_iters: int = 4,
                 mesh=None):
        """mesh: a dp Mesh shards the cluster blocks (and overflow rows) over
        the data axis — k-means/assignment stay global, cluster c's block
        lives on shard c // (K/dp), every shard probes its own centroid slice
        with ceil(nprobe/dp) probes and candidates merge over ICI. `nprobe`
        keeps meaning TOTAL probed clusters, so per-device block reads (the
        latency term) divide by dp at equal total work.

        Probe-set semantics at nprobe < K: the union of per-shard top-
        ceil(nprobe/dp) lists is NOT the identical global top-nprobe set (a
        query whose best clusters concentrate on one shard trades some of
        them for other shards' local winners), so recall at small nprobe can
        differ slightly from the single-device index — either way, since
        other shards' probes are still genuine next-best clusters. nprobe=K
        remains exact; tests cover both regimes."""
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}")
        if n_clusters != "auto" and (not isinstance(n_clusters, (int, np.integer))
                                     or n_clusters < 1):
            raise ValueError(f"n_clusters must be a positive int or 'auto', "
                             f"got {n_clusters!r}")
        self.mesh = mesh
        self.dim = dim
        self.n_clusters = n_clusters
        self.normalize = normalize_embeddings
        self.pad_factor = pad_factor
        self.kmeans_iters = kmeans_iters
        self.train_slab = train_slab        # rows per k-means/assign score tile
        self.max_train_rows = max_train_rows  # k-means sample cap
        self.assign_chunk = assign_chunk    # rows per H2D assignment transfer
        self.nprobe = nprobe
        self.seed = seed
        self.dtype = dtype
        self.quantize = quantize
        self.block_size = block_size   # pending/overflow slab granularity
        self.gather_budget = gather_budget  # bytes: caps qchunk·nprobe·C_pad·D
        self.auto_overflow_target = auto_overflow_target
        self.auto_sweep_iters = auto_sweep_iters
        self.selected_k: Optional[int] = None  # set by build() (auto or not)
        self._chunks: List[np.ndarray] = []      # int8 when quantized else fp32
        self._scale_chunks: List[np.ndarray] = []
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
        self._overflow_ids_dev = None
        self._overflow_count = 0
        # post-build adds (exact-scanned pending slab, like DenseIndex)
        self._pending_arr = None
        self._pending_scales = None
        self._pending_count = 0
        self._pending_dirty = False
        # tombstoned deletions (absolute positions); compacted at build()
        self._deleted: set = set()
        self._pending_mask = None
        self._id_pos = None    # lazy id -> position map
        self._pos_loc = None   # lazy position -> (cluster, slot) | overflow
        self._k_real = 0       # live clusters (K pads to a dp multiple)
        self._sharded_fns: dict = {}  # (kc, k_ov, np_local, k_final) -> jit

    # ------------------------------------------------------------------
    def _install_layout(self, cent, blocks, block_ids, block_scales,
                        ov_rows, ov_scale_vals, ov_id_vals, k_real: int):
        """Place a host block layout on device(s): pad K to the mesh's dp
        multiple (padded clusters: zero centroids, -1 ids, masked out of the
        probe by _k_real), pad/shard the overflow slab. build() and load()
        share this, so a saved index reloads onto ANY mesh shape.

        cent (K, D) fp32; blocks (K, C_pad, D); block_ids (K, C_pad);
        ov_rows (m, D) UNPADDED; ov_id_vals (m,) global doc positions."""
        host_dtype = np.int8 if self.quantize == "int8" else np.float32
        c_pad, d = blocks.shape[1], blocks.shape[2]
        self._k_real = k_real
        # compiled sharded probes bake k_real/k_local in: a rebuild that
        # changes either must never reuse them (stale masks = silently wrong
        # results; stale k_local = shape error — caught by review repro)
        self._sharded_fns = {}
        n_dev = self.mesh.shape["dp"] if self.mesh is not None else 1
        k_pad = _round_up(k_real, n_dev)
        if k_pad != blocks.shape[0]:
            blocks = np.concatenate(
                [blocks[:k_real],
                 np.zeros((k_pad - k_real, c_pad, d), host_dtype)])
            block_ids = np.concatenate(
                [block_ids[:k_real],
                 np.full((k_pad - k_real, c_pad), -1, np.int32)])
            if block_scales is not None:
                block_scales = np.concatenate(
                    [block_scales[:k_real],
                     np.ones((k_pad - k_real, c_pad), np.float32)])
            cent = np.concatenate(
                [cent[:k_real], np.zeros((k_pad - k_real, d), np.float32)])
        self._centroids = self._put(jnp.asarray(cent, jnp.float32),
                                    ("dp", None))
        self._block_ids = self._put(jnp.asarray(block_ids), ("dp", None))
        self._blocks = self._put(
            jnp.asarray(blocks) if self.quantize == "int8"
            else jnp.asarray(blocks, self.dtype), ("dp", None, None))
        self._scales = (self._put(jnp.asarray(block_scales), ("dp", None))
                        if block_scales is not None else None)
        m = ov_rows.shape[0]
        m_pad = _round_up(max(m, 1), self.block_size * n_dev)
        ov = np.zeros((m_pad, d), host_dtype)
        ov_ids = np.full((m_pad,), -1, np.int32)
        ov[:m] = ov_rows
        ov_ids[:m] = ov_id_vals
        if self.quantize == "int8":
            # pad rows: harmless scale 1.0 (their int8 rows are zero anyway)
            ov_scales = np.ones((m_pad,), np.float32)
            ov_scales[:m] = ov_scale_vals
            self._overflow = self._put(jnp.asarray(ov), ("dp", None))
            self._overflow_scales = self._put(jnp.asarray(ov_scales), ("dp",))
        else:
            self._overflow = self._put(jnp.asarray(ov, self.dtype),
                                       ("dp", None))
            self._overflow_scales = None
        self._overflow_ids = ov_ids
        self._overflow_ids_dev = self._put(jnp.asarray(ov_ids), ("dp",))
        self._overflow_count = m

    def _put(self, arr, spec):
        """device_put with a NamedSharding when a mesh is set; no-op else."""
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(arr, NamedSharding(self.mesh, P(*spec)))

    def add(self, embeddings, ids: Optional[Sequence[str]] = None):
        emb = np.asarray(embeddings, np.float32)
        if emb.ndim != 2 or emb.shape[1] != self.dim:
            raise ValueError(f"expected (n, {self.dim}) embeddings, "
                             f"got {emb.shape}")
        if self.normalize:
            emb = emb / np.clip(np.linalg.norm(emb, axis=1, keepdims=True),
                                1e-12, None)
        start = self._count
        if self.quantize == "int8":
            q, s = _quantize_rows(emb)
            self._chunks.append(q)
            self._scale_chunks.append(s)
        else:
            self._chunks.append(emb)
        self._ids.extend(ids if ids is not None
                         else (str(start + i) for i in range(emb.shape[0])))
        self._count += emb.shape[0]
        self._id_pos = None
        if self._blocks is not None:
            self._pending_dirty = True

    def __len__(self) -> int:
        return self.live_count

    @property
    def live_count(self) -> int:
        """Searchable documents: allocated minus tombstoned."""
        return self._count - len(self._deleted)

    @property
    def is_built(self) -> bool:
        return self._blocks is not None

    @property
    def pending_docs(self) -> int:
        dead = sum(1 for p in self._deleted if p >= self._built_count)
        return self._count - self._built_count - dead

    # -- deletion ------------------------------------------------------------
    def _id_positions(self) -> dict:
        if self._id_pos is None:
            self._id_pos = {i: p for p, i in enumerate(self._ids)}
        return self._id_pos

    def _position_locations(self):
        """Lazy inverse of the block layout: position -> (cluster, slot) or
        (-1, overflow_slot). Valid until the next build() re-clusters."""
        if self._pos_loc is None:
            bi = np.asarray(self._block_ids)
            loc_c = np.full(self._built_count, -1, np.int32)
            loc_s = np.full(self._built_count, -1, np.int32)
            ks, ss = np.nonzero(bi >= 0)
            loc_c[bi[ks, ss]] = ks
            loc_s[bi[ks, ss]] = ss
            ov = np.nonzero(self._overflow_ids >= 0)[0]
            loc_s[self._overflow_ids[ov]] = ov  # loc_c stays -1 => overflow
            self._pos_loc = (loc_c, loc_s)
        return self._pos_loc

    def delete(self, ids: Sequence[str]) -> int:
        """Tombstone documents: their block/overflow slots drop to id -1 (the
        search kernels already treat those as -inf), pending rows mask out;
        the next build() re-clusters without them. Raises KeyError for
        unknown/already-deleted ids."""
        ids = list(ids)
        if len(set(ids)) != len(ids):  # same contract as two sequential calls
            raise KeyError("duplicate ids in one delete() call")
        pos_map = self._id_positions()
        missing = [i for i in ids
                   if i not in pos_map or pos_map[i] in self._deleted]
        if missing:
            raise KeyError(f"cannot delete unknown ids: {missing[:5]}")
        blk_c, blk_s, ov_slots = [], [], []
        touched_pending = False
        for i in ids:
            p = pos_map[i]
            self._deleted.add(p)
            if p >= self._built_count:
                touched_pending = True
                continue
            loc_c, loc_s = self._position_locations()
            if loc_c[p] >= 0:
                blk_c.append(loc_c[p])
                blk_s.append(loc_s[p])
            else:
                ov_slots.append(loc_s[p])
        if blk_c:
            self._block_ids = self._put(self._block_ids.at[
                jnp.asarray(blk_c), jnp.asarray(blk_s)].set(-1), ("dp", None))
        if ov_slots:
            self._overflow_ids[ov_slots] = -1
            self._overflow_ids_dev = self._put(
                jnp.asarray(self._overflow_ids), ("dp",))
        if touched_pending:
            self._pending_mask = None
        return len(ids)

    # ------------------------------------------------------------------
    def _host_corpus(self) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """All docs (built + pending) as host rows in position order:
        (int8 rows, fp32 scales) when quantized, (fp32 rows, None) otherwise."""
        chunks = list(self._chunks)
        scale_chunks = list(self._scale_chunks)
        if self._blocks is not None:
            prev, prev_scales = self._rebuild_host_rows()
            chunks.insert(0, prev)
            if prev_scales is not None:
                scale_chunks.insert(0, prev_scales)
        rows = np.concatenate(chunks, axis=0)
        scales = (np.concatenate(scale_chunks)
                  if self.quantize == "int8" else None)
        return rows, scales

    def _estimate_overflow(self, counts: np.ndarray, train_n: int, n: int,
                           k: int) -> float:
        """Corpus-scaled overflow-fraction estimate for candidate K from the
        training sample's cluster counts: scale sample counts by n/train_n
        and spill them against the REAL C_pad formula build() will use."""
        c_pad = max(_round_up(int(self.pad_factor * max(1, n // k)), 8), 8)
        est_sizes = counts * (n / train_n)
        return float(np.maximum(est_sizes - c_pad, 0.0).sum() / n)

    def _select_k(self, dev, valid, train_n: int, n: int, rng,
                  slab: int) -> int:
        """n_clusters="auto": sweep power-of-two K candidates on the training
        sample (short k-means + one sample assignment each), estimate each
        K's overflow fraction, and pick the LARGEST K under
        auto_overflow_target — the knee where k-means stops matching the
        corpus's natural cluster granularity (the measured 10M failure mode:
        K=16384 over a 4096-topic corpus spilled 38% to overflow and the
        probe degenerated to a half-corpus exact scan, docs/PERF.md).

        Candidates cap at train_n//64 so every estimate averages ≥64 sample
        rows per cluster — below that, sampling noise reads as overflow and
        the estimate is meaningless (raise max_train_rows to unlock larger
        K; the final k-means trains on the same sample anyway)."""
        kmax = min(train_n // 64, max(1, n // 8), 1 << 16)
        cands = []
        k = 8
        while k <= kmax:
            cands.append(k)
            k <<= 1
        if not cands:
            return max(1, min(8, n))
        sweep = []
        for K in cands:
            seed_idx = jnp.asarray(
                rng.choice(train_n, size=K, replace=False), jnp.int32)
            cent = _kmeans(dev, valid, seed_idx, K, self.auto_sweep_iters,
                           slab)
            a = np.asarray(_assign_corpus(dev, cent, slab))[:train_n]
            ovf = self._estimate_overflow(np.bincount(a, minlength=K),
                                          train_n, n, K)
            sweep.append((K, ovf))
        logger.info("IVF auto-K sweep (sample=%d, target overflow ≤ %.0f%%): %s",
                    train_n, 100 * self.auto_overflow_target,
                    ", ".join(f"K={k}: {o:.1%}" for k, o in sweep))
        under = [k for k, o in sweep if o <= self.auto_overflow_target]
        if under:
            return max(under)
        best = min(sweep, key=lambda t: t[1])
        logger.warning(
            "IVF auto-K: no candidate meets the %.0f%% overflow target "
            "(best: K=%d at %.1f%%) — the corpus has little cluster "
            "structure at these granularities; picking K=%d. Consider a "
            "larger pad_factor or the exact DenseIndex.",
            100 * self.auto_overflow_target, best[0], 100 * best[1], best[0])
        return best[0]

    def build(self):
        """(Re-)cluster everything (built + pending) into the block layout.

        Scales past HBM: k-means trains on a ≤max_train_rows sample, then the
        full corpus streams through the assignment matmul in assign_chunk
        host→device transfers — only the (train_slab, K) score tile and one
        chunk of rows are ever resident beyond the final block layout.
        """
        if not self._chunks and self._blocks is None:
            raise RuntimeError("build() on an empty index")
        if self._blocks is not None and not self._chunks and not self._deleted:
            return self  # built, nothing pending, nothing to compact
        corpus, scales = self._host_corpus()
        if self._deleted:  # compact tombstones away; positions renumber here
            corpus, scales, self._ids = _compact_deleted(
                corpus, scales, self._ids, self._deleted,
                self.quantize == "int8")
            self._deleted = set()
        n, d = corpus.shape
        if n == 0:  # everything was deleted: revert to the empty, un-built state
            self._centroids = self._blocks = self._block_ids = None
            self._scales = self._overflow = self._overflow_scales = None
            self._overflow_ids = self._overflow_ids_dev = None
            self._overflow_count = self._count = self._built_count = 0
            self._chunks, self._scale_chunks = [], []
            self._pending_arr = self._pending_scales = self._pending_mask = None
            self._pending_count, self._pending_dirty = 0, False
            self._id_pos = self._pos_loc = None
            self._k_real = 0
            return self
        auto = self.n_clusters == "auto"
        K = None if auto else min(self.n_clusters, n)
        rng = np.random.default_rng(self.seed)

        # ---- train on a sample (fp32 on device; slab-scanned matmuls) ----
        train_n = min(n, max(self.max_train_rows, K or 0))
        if train_n < n:
            sample_idx = np.sort(rng.choice(n, size=train_n, replace=False))
        else:
            sample_idx = np.arange(n)
        sample = corpus[sample_idx].astype(np.float32)
        if self.quantize == "int8":
            sample *= scales[sample_idx][:, None]
        slab = min(self.train_slab, _round_up(train_n, 8))
        s_pad = _round_up(train_n, slab)
        sample_pad = np.zeros((s_pad, d), np.float32)
        sample_pad[:train_n] = sample
        del sample
        dev = jnp.asarray(sample_pad)
        valid = jnp.asarray((np.arange(s_pad) < train_n).astype(np.float32))
        if auto:
            K = self._select_k(dev, valid, train_n, n, rng, slab)
            logger.info("IVF auto-K selected n_clusters=%d for %d docs", K, n)
        self.selected_k = K
        seed_idx = jnp.asarray(rng.choice(train_n, size=K, replace=False),
                               jnp.int32)
        cent = _kmeans(dev, valid, seed_idx, K, self.kmeans_iters, slab)
        del dev, valid

        # ---- streamed full-corpus assignment ----
        assign = np.empty(n, np.int32)
        chunk = _round_up(min(self.assign_chunk, n), slab)
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            r_pad = _round_up(e - s, slab)
            if self.quantize == "int8":
                rows = np.zeros((r_pad, d), np.int8)
                rows[: e - s] = corpus[s:e]
            else:
                rows = np.zeros((r_pad, d), np.float32)
                rows[: e - s] = corpus[s:e]
            a = _assign_corpus(jnp.asarray(rows), cent, slab)
            assign[s:e] = np.asarray(a)[: e - s]

        # ---- balanced block layout (host; rows keep their stored dtype) ----
        order = np.argsort(assign, kind="stable")
        sizes = np.bincount(assign, minlength=K)
        c_pad = max(_round_up(int(self.pad_factor * max(1, n // K)), 8), 8)
        host_dtype = np.int8 if self.quantize == "int8" else np.float32
        blocks = np.zeros((K, c_pad, d), host_dtype)
        block_ids = np.full((K, c_pad), -1, np.int32)
        block_scales = (np.zeros((K, c_pad), np.float32)
                        if self.quantize == "int8" else None)
        overflow_rows, overflow_ids = [], []
        pos = 0
        for c in range(K):
            members = order[pos:pos + sizes[c]]
            pos += sizes[c]
            take = members[:c_pad]
            blocks[c, :len(take)] = corpus[take]
            block_ids[c, :len(take)] = take
            if block_scales is not None:
                block_scales[c, :len(take)] = scales[take]
            if len(members) > c_pad:   # spill: scanned exactly, never dropped
                overflow_rows.append(corpus[members[c_pad:]])
                overflow_ids.append(members[c_pad:])
        m = sum(len(o) for o in overflow_ids)
        if m and m / n > self.auto_overflow_target:
            # the measured failure mode: at 38% overflow the "probe" was
            # mostly a half-corpus exact scan (docs/PERF.md, 10M bench) —
            # warn loudly instead of burying the number at INFO level
            logger.warning(
                "IVF overflow is %.1f%% of the corpus (%d/%d docs past "
                "C_pad=%d) — every search exact-scans that slab, eroding "
                "the probe's latency win. K=%d likely exceeds the corpus's "
                "natural cluster count; rebuild with n_clusters='auto' "
                "(sweeps K on the training sample) or a smaller K.",
                100.0 * m / n, m, n, c_pad, K)
        elif m:
            logger.info("IVF overflow: %d/%d docs (%.1f%%) spill past "
                        "C_pad=%d; they are exact-scanned each search",
                        m, n, 100.0 * m / n, c_pad)

        if m:
            ov_rows = np.concatenate(overflow_rows)
            ov_id_vals = np.concatenate(overflow_ids)
            ov_scale_vals = (scales[ov_id_vals]
                             if self.quantize == "int8" else None)
        else:
            ov_rows = np.zeros((0, d), host_dtype)
            ov_id_vals = np.zeros((0,), np.int32)
            ov_scale_vals = (np.zeros((0,), np.float32)
                             if self.quantize == "int8" else None)
        self._install_layout(np.asarray(cent, np.float32), blocks, block_ids,
                             block_scales, ov_rows, ov_scale_vals, ov_id_vals,
                             K)
        self._built_count = n
        self._count = n
        self._chunks, self._scale_chunks = [], []
        self._pending_arr, self._pending_scales = None, None
        self._pending_count, self._pending_dirty = 0, False
        self._pending_mask = None
        self._id_pos = self._pos_loc = None
        return self

    def _rebuild_host_rows(self) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Fetch the built corpus back to host in position order, in its
        STORED dtype (int8 rows + scales when quantized — rebuilds never
        re-quantize, so merge rebuilds accumulate no extra error)."""
        blocks = np.asarray(self._blocks)
        flat_ids = np.asarray(self._block_ids).reshape(-1)
        flat = blocks.reshape(-1, self.dim)
        ov = np.asarray(self._overflow)
        host_dtype = np.int8 if self.quantize == "int8" else np.float32
        out = np.zeros((self._built_count, self.dim), host_dtype)
        live = flat_ids >= 0
        out[flat_ids[live]] = flat[live]
        keep = self._overflow_ids >= 0
        out[self._overflow_ids[keep]] = ov[keep]
        if self.quantize != "int8":
            return out, None
        scales = np.ones((self._built_count,), np.float32)
        scales[flat_ids[live]] = np.asarray(self._scales).reshape(-1)[live]
        scales[self._overflow_ids[keep]] = \
            np.asarray(self._overflow_scales)[keep]
        return out, scales

    # -- persistence --------------------------------------------------------
    def save(self, path: str):
        """Persist the BUILT state (centroids + block layout + overflow) plus
        any pending docs to one .npz — load() restores without re-running
        k-means, so a 10M-doc server restart skips both the re-encode AND the
        re-cluster. int8 rows round-trip verbatim."""
        import json as _json

        payload = {
            "ids": _encode_ids(self._ids),
            "meta": np.bytes_(_json.dumps({
                "kind": "ivf", "dim": self.dim, "n_clusters": self.n_clusters,
                "selected_k": self.selected_k,
                "normalize": self.normalize, "quantize": self.quantize,
                "pad_factor": self.pad_factor, "nprobe": self.nprobe,
                "block_size": self.block_size, "dtype": np.dtype(self.dtype).name,
                "count": self._count, "built_count": self._built_count,
                "overflow_count": self._overflow_count,
                "k_real": self._k_real,
                "built": self._blocks is not None,
            }).encode()),
        }
        if self._blocks is not None:
            # canonical (pad-free) form: K-padding and overflow padding are
            # mesh-shape-dependent, so load() re-pads for ITS mesh
            kr, m = self._k_real, self._overflow_count
            blocks = np.asarray(self._blocks)[:kr]
            ov = np.asarray(self._overflow)[:m]
            if self.quantize != "int8":    # bf16 → fp32 (exact upcast)
                blocks = blocks.astype(np.float32)
                ov = ov.astype(np.float32)
            payload.update(
                centroids=np.asarray(self._centroids, np.float32)[:kr],
                blocks=blocks,
                block_ids=np.asarray(self._block_ids)[:kr],
                overflow=ov, overflow_ids=self._overflow_ids[:m])
            if self.quantize == "int8":
                payload["scales"] = np.asarray(self._scales, np.float32)[:kr]
                payload["overflow_scales"] = np.asarray(
                    self._overflow_scales, np.float32)[:m]
        if self._chunks:
            payload["pending"] = np.concatenate(self._chunks)
            if self.quantize == "int8":
                payload["pending_scales"] = np.concatenate(self._scale_chunks)
        if self._deleted:
            # tombstones persist as positions: the block/overflow -1 slots are
            # already in the saved arrays, but live_count/delete() bookkeeping
            # needs the set itself
            payload["deleted"] = np.asarray(sorted(self._deleted), np.int64)
        np.savez(path, **payload)

    @classmethod
    def load(cls, path: str, **kw) -> "IVFIndex":
        import json as _json

        z = np.load(path)
        meta = _json.loads(bytes(z["meta"]))
        if meta.get("kind") != "ivf":
            raise ValueError(f"{path} holds a {meta.get('kind')!r} index; "
                             "use the matching class to load it")
        idx = cls(meta["dim"], n_clusters=meta["n_clusters"],
                  normalize_embeddings=meta["normalize"],
                  quantize=meta["quantize"], pad_factor=meta["pad_factor"],
                  nprobe=meta["nprobe"], block_size=meta["block_size"],
                  dtype=np.dtype(meta["dtype"]), **kw)
        idx._ids = _decode_ids(z["ids"], meta["count"])
        idx._count = meta["count"]
        idx._built_count = meta["built_count"]
        idx.selected_k = meta.get("selected_k")
        if meta["built"]:
            quant = meta["quantize"] == "int8"
            # files pre-dating the canonical form carry K/overflow padding;
            # k_real + overflow_count slice it away either way
            kr = meta.get("k_real", z["centroids"].shape[0])
            m = meta["overflow_count"]
            host_dtype = np.int8 if quant else np.float32
            idx._install_layout(
                z["centroids"][:kr],
                z["blocks"][:kr].astype(host_dtype, copy=False),
                z["block_ids"][:kr],
                z["scales"][:kr] if quant else None,
                z["overflow"][:m].astype(host_dtype, copy=False),
                z["overflow_scales"][:m] if quant else None,
                z["overflow_ids"][:m], kr)
        if "pending" in z.files:
            idx._chunks = [z["pending"]]
            if meta["quantize"] == "int8":
                idx._scale_chunks = [z["pending_scales"]]
            idx._pending_dirty = True
        if "deleted" in z.files:
            idx._deleted = set(z["deleted"].tolist())
        return idx

    # ------------------------------------------------------------------
    def _scan_slab(self, qd, arr, scales, count, k, row_mask=None):
        vals, idx = jax.device_get(           # one batched fetch, not two
            blockmax_topk(qd, arr, count, k=k, block_size=self.block_size,
                          corpus_scale=scales, row_mask=row_mask))
        return vals.astype(np.float32), idx

    def _search_pending(self, qd, k: int):
        if self._pending_arr is None or self._pending_dirty:
            pend = np.concatenate(self._chunks, axis=0)
            n = pend.shape[0]
            blocks = -(-n // self.block_size)
            n_pad = self.block_size * (1 << max(0, (blocks - 1).bit_length()))
            host_dtype = np.int8 if self.quantize == "int8" else np.float32
            padded = np.zeros((n_pad, self.dim), host_dtype)
            padded[:n] = pend
            if self.quantize == "int8":
                s = np.ones((n_pad,), np.float32)
                s[:n] = np.concatenate(self._scale_chunks)
                self._pending_arr = jnp.asarray(padded)
                self._pending_scales = jnp.asarray(s)
            else:
                self._pending_arr = jnp.asarray(padded, self.dtype)
                self._pending_scales = None
            self._pending_count = n
            self._pending_dirty = False
            self._pending_mask = None
        if self._pending_mask is None:
            dead = [p - self._built_count for p in self._deleted
                    if p >= self._built_count]
            if dead:
                m = np.ones(self._pending_arr.shape[0], bool)
                m[dead] = False
                self._pending_mask = jnp.asarray(m)
        # clamp AFTER the lazy refresh above — _pending_count is stale (even
        # zero) until then, and a k clamped against the stale value would
        # silently drop every pending hit
        return self._scan_slab(qd, self._pending_arr, self._pending_scales,
                               self._pending_count,
                               min(k, self._pending_count),
                               row_mask=self._pending_mask)

    def search_embeddings(self, query_embeddings, k: int = 10, *,
                          nprobe: Optional[int] = None,
                          qchunk: Optional[int] = None
                          ) -> Tuple[List[np.ndarray], List[List[str]]]:
        """Same ragged contract as DenseIndex.search_embeddings: (per-query
        score arrays, per-query id lists). qchunk bounds the gathered-block
        memory (Q·nprobe·C_pad·D per chunk); by default it is sized so the
        gather stays under gather_budget bytes."""
        q = np.asarray(query_embeddings, np.float32)
        if q.size == 0:  # empty batch (incl. 1-D np.asarray([])) — no work
            return [], []
        if self._blocks is None:
            if self._chunks:
                raise RuntimeError(
                    "search before build(): added embeddings are still "
                    "pending — call build() first")
            return ([np.zeros((0,), np.float32) for _ in q], [[] for _ in q])
        if self.live_count == 0:
            return ([np.zeros((0,), np.float32) for _ in q], [[] for _ in q])
        if self.normalize:
            q = q / np.clip(np.linalg.norm(q, axis=1, keepdims=True),
                            1e-12, None)
        nprobe = min(nprobe or self.nprobe, self._k_real)
        c_pad = int(self._blocks.shape[1])
        n_dev = self.mesh.shape["dp"] if self.mesh is not None else 1
        nprobe_local = min(-(-nprobe // n_dev),
                           int(self._centroids.shape[0]) // n_dev)
        if qchunk is None:  # per-DEVICE gathered blocks bound the budget
            row_bytes = (nprobe_local * c_pad * self.dim
                         * self._blocks.dtype.itemsize)
            qchunk = max(1, min(16, self.gather_budget // max(row_bytes, 1)))
        k_eff = min(k, self.live_count)
        kc = min(k_eff, nprobe * c_pad)

        vals_l, ids_l = [], []
        for s in range(0, q.shape[0], qchunk):
            qs = jnp.asarray(q[s:s + qchunk])
            if self.mesh is not None:
                kc_l = min(k_eff, nprobe_local * c_pad)
                ov_rows = int(self._overflow.shape[0]) // n_dev
                k_ov = min(k_eff, ov_rows)
                k_final = min(k_eff, n_dev * (kc_l + k_ov))
                k_local = int(self._centroids.shape[0]) // n_dev
                # key carries EVERY static the closure bakes in (k_real,
                # k_local included) — _install_layout also clears the cache
                key = (kc_l, k_ov, nprobe_local, k_final,
                       self._k_real, k_local)
                fn = self._sharded_fns.get(key)
                if fn is None:
                    fn = _make_sharded_probe(
                        self.mesh, k_local,
                        self._k_real, self.quantize == "int8",
                        self.block_size, kc_l, k_ov, nprobe_local, k_final)
                    self._sharded_fns[key] = fn
                args = [qs, self._centroids, self._blocks, self._block_ids]
                if self.quantize == "int8":
                    args.append(self._scales)
                args.append(self._overflow)
                if self.quantize == "int8":
                    args.append(self._overflow_scales)
                args.append(self._overflow_ids_dev)
                tv, ti = jax.device_get(fn(*args))
                tv = tv.astype(np.float32)
            elif self._overflow_count:
                tv, ti = jax.device_get(_probe_overflow_search(
                    qs, self._centroids, self._blocks, self._block_ids,
                    self._scales, self._overflow, self._overflow_scales,
                    self._overflow_ids_dev, self._overflow_count, kc,
                    min(k_eff, self._overflow_count), nprobe,
                    self.quantize == "int8", self.block_size))
                tv = tv.astype(np.float32)
            else:
                tv, ti = jax.device_get(_probe_search(
                    qs, self._centroids, self._blocks, self._block_ids,
                    self._scales, kc, nprobe, self.quantize == "int8"))
                tv = tv.astype(np.float32)
            if self._chunks:
                pv, pi = self._search_pending(qs, k_eff)
                tv = np.concatenate([tv, pv], axis=1)
                ti = np.concatenate([ti, pi + self._built_count], axis=1)
                ord_ = np.argsort(-tv, axis=1, kind="stable")
                tv = np.take_along_axis(tv, ord_, axis=1)
                ti = np.take_along_axis(ti, ord_, axis=1)
            vals_l.append(tv[:, :k_eff])
            ids_l.append(ti[:, :k_eff])
        vals = np.concatenate(vals_l, axis=0)
        idx = np.concatenate(ids_l, axis=0)
        finite = (vals > -1e29) & (idx >= 0)
        ids = [[self._ids[int(i)] for i, ok in zip(row_i, row_f) if ok]
               for row_i, row_f in zip(idx, finite)]
        return ([row_v[row_f] for row_v, row_f in zip(vals, finite)], ids)


def _quantize_rows(emb: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 (same scheme as DenseIndex, index.py:94-97)."""
    scale = np.clip(np.abs(emb).max(axis=-1), 1e-12, None) / 127.0
    q = np.round(emb / scale[..., None]).astype(np.int8)
    return q, scale.astype(np.float32)
