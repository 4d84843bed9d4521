"""DenseIndex — the serving-side embed→index→query engine.

The north-star serving shape (BASELINE.json): corpus embeddings live in device
HBM sharded over the mesh's dp axis; a query batch broadcasts to all shards,
each shard runs the exact block-max top-k scan over its slice
(ops/topk.blockmax_topk), and the per-shard candidates merge over ICI via a
tiled all_gather — the (Q, N) score matrix never exists anywhere.

Single-device path is the same kernel without the shard_map wrapper.
"""
from __future__ import annotations

import json
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.pooling import normalize
from .ops.topk import blockmax_topk


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _encode_ids(ids: List[str]) -> np.ndarray:
    """Doc ids → one uint8 buffer (np.savez of a 10M-string unicode array
    pads every id to the longest; a newline-joined utf-8 buffer doesn't)."""
    joined = "\n".join(ids)
    if joined.count("\n") != max(len(ids) - 1, 0):
        raise ValueError("doc ids containing newlines cannot be persisted")
    return np.frombuffer(joined.encode("utf-8"), np.uint8)


def _decode_ids(buf: np.ndarray, n: int) -> List[str]:
    """Inverse of _encode_ids. `n` (the saved doc count) disambiguates the
    one case the join can't: zero ids and a single empty-string id both
    encode to an empty buffer — without n, a [""]-id index reloaded with
    _ids=[] and the first search crashed on self._ids[0]."""
    raw = buf.tobytes().decode("utf-8")
    ids = raw.split("\n") if n else []
    if len(ids) != n:
        raise ValueError(f"corrupt id buffer: {len(ids)} ids for {n} docs")
    return ids


def _compact_deleted(rows: np.ndarray, scales: Optional[np.ndarray],
                     ids: List[str], deleted: set, quantized: bool):
    """Drop tombstoned absolute positions from position-ordered host state.

    One implementation for every compaction site (DenseIndex build/save,
    IVFIndex build) so the served and persisted corpora can never drift."""
    keep = np.ones(rows.shape[0], bool)
    keep[list(deleted)] = False
    rows = rows[keep]
    if quantized:
        scales = scales[keep]
    ids = [i for i, kp in zip(ids, keep) if kp]
    return rows, scales, ids


class DenseIndex:
    """Exact MIPS index over (possibly mesh-sharded) corpus embeddings."""

    def __init__(self, dim: int, *, normalize_embeddings: bool = True,
                 mesh=None, block_size: int = 128, dtype=jnp.bfloat16,
                 kernel: str = "blockmax", slab_size: int = 1 << 20,
                 quantize: Optional[str] = None):
        """kernel: 'blockmax' (XLA two-phase, any k — the measured-fastest
        path, docs/PERF.md) or 'pallas' (streaming fused kernel, k <= 16,
        single-device — ops/pallas/mips.py).

        slab_size: max docs scored per matmul. Shards larger than this scan
        slab-by-slab with an on-device running merge, so a shard bigger than
        the HBM budget for its (Q, shard) score matrix still works.

        quantize: "int8" stores the corpus as per-row symmetric int8 + fp32
        row scales — HALF the HBM of bf16 (10M × 768 ≈ 7.7 GB fits one 16 GB
        chip where bf16's 15.4 GB does not) and roughly doubles the
        bandwidth-bound scan; the score matmul runs int8×int8 on the MXU's
        double-rate path with fp32 dequantization before the top-k filter
        (ops/topk.blockmax_topk corpus_scale). Recall vs bf16 >= 0.99 on
        normalized embeddings (tests/test_index.py)."""
        self.dim = dim
        self.normalize = normalize_embeddings
        self.mesh = mesh
        self.block_size = block_size
        # slab must tile by blocks; round up so the padding math below can
        # guarantee shard_n % slab_size == 0 whenever shards exceed the slab
        self.slab_size = _round_up(max(slab_size, block_size), block_size)
        self.dtype = dtype
        self.kernel = kernel
        if quantize not in (None, "int8"):
            raise ValueError(f"unknown quantize mode {quantize!r}; "
                             "supported: 'int8'")
        if kernel == "pallas" and quantize is not None:
            raise ValueError("the pallas streaming kernel scores float tiles; "
                             "use kernel='blockmax' with quantize='int8'")
        self.quantize = quantize
        if kernel == "pallas" and mesh is not None:
            raise ValueError("pallas kernel is single-device; use blockmax with a mesh")
        self._chunks: List[np.ndarray] = []
        self._scale_chunks: List[np.ndarray] = []
        self._ids: List[str] = []
        self._corpus = None       # device array after build()
        self._scales = None       # (N,) fp32 device array when quantized
        self._count = 0           # total valid docs (built + pending)
        self._built_count = 0     # docs inside the built device corpus
        self._search_fn = None
        self._slab_eff = self.slab_size   # set per corpus by _padded_size
        # post-build incremental adds stage here until the next build()
        self._pending_arr = None
        self._pending_scales = None
        self._pending_count = 0
        self._pending_dirty = False
        # tombstoned deletions: absolute positions; compacted at build()/save()
        self._deleted: set = set()
        self._mask_host = None    # (N_pad,) bool over the BUILT corpus
        self._row_mask = None     # device copy passed to the search fn
        self._pending_mask = None  # device (pad,) bool over the pending slab
        self._id_pos = None       # lazy id -> position map for delete()

    # ------------------------------------------------------------------
    def add(self, embeddings, ids: Optional[Sequence[str]] = None):
        """Add embeddings. Before build(): accumulate. After build(): docs
        join a PENDING slab that search scans alongside the built corpus
        (host-staged, exact); the next build() merges it into the main
        static-shape corpus. Serving keeps answering between the two."""
        emb = np.asarray(embeddings, np.float32)
        if self.normalize:
            emb = emb / np.clip(np.linalg.norm(emb, axis=1, keepdims=True),
                                1e-12, None)
        start = self._count
        if self.quantize == "int8":
            scale = np.clip(np.abs(emb).max(axis=1), 1e-12, None) / 127.0
            self._scale_chunks.append(scale.astype(np.float32))
            emb = np.round(emb / scale[:, None]).astype(np.int8)
        self._chunks.append(emb)
        self._ids.extend(ids if ids is not None
                         else (str(start + i) for i in range(emb.shape[0])))
        self._count += emb.shape[0]
        self._id_pos = None
        if self._corpus is not None:
            self._pending_dirty = True

    def _id_positions(self) -> dict:
        if self._id_pos is None:
            # duplicates (not produced by this class; callers may) map to the
            # LAST-added occurrence — the one search surfaces on a score tie
            self._id_pos = {i: p for p, i in enumerate(self._ids)}
        return self._id_pos

    def delete(self, ids: Sequence[str]) -> int:
        """Tombstone documents: their rows score -inf immediately (search
        results can never include them); the next build() or save() compacts
        them away. Raises KeyError for unknown/already-deleted ids. Positions
        and remaining ids are stable until the compacting build()."""
        if self.kernel == "pallas":
            raise ValueError("delete() requires kernel='blockmax' (the pallas "
                             "streaming kernel has no tombstone-mask input)")
        ids = list(ids)
        if len(set(ids)) != len(ids):  # same contract as two sequential calls
            raise KeyError("duplicate ids in one delete() call")
        pos_map = self._id_positions()
        missing = [i for i in ids
                   if i not in pos_map or pos_map[i] in self._deleted]
        if missing:
            raise KeyError(f"cannot delete unknown ids: {missing[:5]}")
        built_pos = []
        touched_pending = False
        for i in ids:
            p = pos_map[i]
            self._deleted.add(p)
            if p < self._built_count:
                built_pos.append(p)
            else:
                touched_pending = True
        if built_pos and self._corpus is not None:
            if self._mask_host is None:
                self._mask_host = np.ones(self._corpus.shape[0], bool)
            self._mask_host[built_pos] = False
            self._push_row_mask()
            self._search_fn = self._make_search_fn()
        if touched_pending:
            self._pending_mask = None  # rebuilt lazily in _search_pending
        return len(ids)

    def _push_row_mask(self):
        mask = jnp.asarray(self._mask_host)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            mask = jax.device_put(mask, NamedSharding(self.mesh, P("dp")))
        self._row_mask = mask

    @property
    def live_count(self) -> int:
        """Searchable documents: allocated minus tombstoned."""
        return self._count - len(self._deleted)

    @classmethod
    def from_device_embeddings(cls, corpus: jax.Array,
                               ids: Optional[Sequence[str]] = None, *,
                               mesh=None, normalize_embeddings: bool = False,
                               block_size: int = 128) -> "DenseIndex":
        """Wrap an already-on-device (N, D) embedding array (no host copy)."""
        n, dim = corpus.shape
        if normalize_embeddings:
            corpus = normalize(corpus)  # on device; queries normalize at search
        idx = cls(dim, mesh=mesh, normalize_embeddings=normalize_embeddings,
                  block_size=block_size, dtype=corpus.dtype)
        idx._count = n
        idx._built_count = n
        idx._ids = list(ids) if ids is not None else [str(i) for i in range(n)]
        n_dev = mesh.shape["dp"] if mesh is not None else 1
        n_pad = idx._padded_size(n, n_dev)
        if n_pad != n:
            pad = jnp.zeros((n_pad - n, dim), corpus.dtype)
            corpus = jnp.concatenate([corpus, pad])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            corpus = jax.device_put(corpus, NamedSharding(mesh, P("dp", None)))
        idx._corpus = corpus
        idx._search_fn = idx._make_search_fn()
        return idx

    def _padded_size(self, n: int, n_dev: int) -> int:
        """Corpus rows after padding: always a multiple of block_size*n_dev.

        When a shard exceeds the slab budget, the shard splits into k EQUAL
        block-aligned slabs (k = ceil(shard_blocks/slab_blocks), effective
        slab = ceil(shard_blocks/k) blocks ≤ slab_size) and pads to
        k·slab_eff rows. Padding is bounded by ~k·block_size·n_dev rows —
        the old round-up-to-slab_size·n_dev scheme could pad nearly a whole
        slab per device (≈8 GB of zero rows at D=4096/bf16 for n just past
        one slab), an OOM risk in exactly the memory regime slab_size
        protects (review finding). Sets self._slab_eff for the search fn."""
        granularity = self.block_size * n_dev
        n_pad = max(_round_up(n, granularity), granularity)
        shard = n_pad // n_dev
        self._slab_eff = self.slab_size
        if shard > self.slab_size:
            shard_blocks = shard // self.block_size
            slab_blocks = self.slab_size // self.block_size
            k = -(-shard_blocks // slab_blocks)
            self._slab_eff = -(-shard_blocks // k) * self.block_size
            n_pad = k * self._slab_eff * n_dev
        return n_pad

    def build(self):
        """Pad to static shape and place on device(s).

        Rebuild semantics: if a corpus is already built and docs were added
        since, the valid built rows fetch back to host ONCE and merge with
        the pending docs into a fresh static-shape corpus (the amortized
        slow path; between builds, search scans built + pending exactly)."""
        host_dtype = np.int8 if self.quantize == "int8" else np.float32
        chunks = list(self._chunks)
        scale_chunks = list(self._scale_chunks)
        if self._corpus is not None:
            if not chunks and not self._deleted:
                return self  # nothing pending, nothing to compact
            built = np.asarray(self._corpus[: self._built_count])
            chunks.insert(0, built.astype(host_dtype))
            if self.quantize == "int8":
                scale_chunks.insert(
                    0, np.asarray(self._scales[: self._built_count],
                                  np.float32))
        emb = (np.concatenate(chunks, axis=0) if chunks
               else np.zeros((0, self.dim), host_dtype))
        all_scales = (np.concatenate(scale_chunks) if scale_chunks
                      else np.zeros((0,), np.float32))
        if self._deleted:  # compact tombstones away; positions renumber here
            emb, all_scales, self._ids = _compact_deleted(
                emb, all_scales, self._ids, self._deleted,
                self.quantize == "int8")
            self._deleted = set()
        self._mask_host = None
        self._row_mask = None
        self._pending_mask = None
        self._id_pos = None
        self._count = emb.shape[0]
        self._built_count = self._count
        n_dev = self.mesh.shape["dp"] if self.mesh is not None else 1
        n_pad = self._padded_size(self._count, n_dev)
        padded = np.zeros((n_pad, self.dim), host_dtype)
        padded[: self._count] = emb
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            row_sharding = NamedSharding(self.mesh, P("dp", None))
            scale_sharding = NamedSharding(self.mesh, P("dp"))
        if self.quantize == "int8":
            arr = jnp.asarray(padded)          # int8 stays int8 on device
            scales = np.ones((n_pad,), np.float32)  # pad rows: harmless scale
            scales[: self._count] = all_scales
            sc = jnp.asarray(scales)
            if self.mesh is not None:
                arr = jax.device_put(arr, row_sharding)
                sc = jax.device_put(sc, scale_sharding)
            self._scales = sc
        else:
            arr = jnp.asarray(padded, self.dtype)
            if self.mesh is not None:
                arr = jax.device_put(arr, row_sharding)
        self._corpus = arr
        self._chunks = []
        self._scale_chunks = []
        self._pending_arr = None
        self._pending_scales = None
        self._search_fn = self._make_search_fn()
        return self

    # ------------------------------------------------------------------
    def _make_search_fn(self):
        block_size = self.block_size
        if self.mesh is None:
            if self.kernel == "pallas":
                from .ops.pallas.mips import mips_topk
                n = self._corpus.shape[0]
                tile = 2048 if n % 2048 == 0 else block_size

                def search(queries, k: int):
                    return mips_topk(queries, self._corpus, self._built_count,
                                     k=k, tile_n=tile)
                return search

            def search(queries, k: int):
                return blockmax_topk(queries, self._corpus, self._built_count,
                                     k=k, block_size=block_size,
                                     slab_size=self._slab_eff,
                                     corpus_scale=self._scales,
                                     row_mask=self._row_mask)
            return search

        mesh = self.mesh
        n_dev = mesh.shape["dp"]
        shard_n = self._corpus.shape[0] // n_dev
        count = self._built_count
        # _padded_size guarantees shard_n tiles by _slab_eff; keep the
        # whole-shard fallback for defense (blockmax_topk does the same)
        slab = self._slab_eff if shard_n % self._slab_eff == 0 else shard_n
        from jax.sharding import PartitionSpec as P
        quantized = self.quantize == "int8"
        masked = self._row_mask is not None  # delete() rebuilds this fn

        def shard_search(queries, corpus_shard, scale_shard, mask_shard,
                         k: int):
            """Runs per device: local exact top-k (slab-scanned when the shard
            exceeds slab_size, so (Q, shard) scores never materialize), then
            ICI-merge."""
            rank = jax.lax.axis_index("dp")
            base = rank * shard_n
            local_valid = jnp.clip(count - base, 0, shard_n)
            vals, idx = blockmax_topk(queries, corpus_shard, local_valid, k=k,
                                      block_size=block_size, slab_size=slab,
                                      corpus_scale=scale_shard,
                                      row_mask=mask_shard)
            idx = idx + base
            # gather all shards' candidates: (n_dev*k) per query, then top-k.
            all_vals = jax.lax.all_gather(vals, "dp", axis=1, tiled=True)
            all_idx = jax.lax.all_gather(idx, "dp", axis=1, tiled=True)
            top_vals, pos = jax.lax.top_k(all_vals, k)
            return top_vals, jnp.take_along_axis(all_idx, pos, axis=1)

        @partial(jax.jit, static_argnames=("k",))
        def search(queries, k: int):
            # check_vma off: outputs ARE replicated (same all_gather + top_k on
            # every device) but the varying-axis checker can't infer that
            args = [queries, self._corpus]
            specs = [P(None, None), P("dp", None)]
            if quantized:
                args.append(self._scales)
                specs.append(P("dp"))
            if masked:
                args.append(self._row_mask)
                specs.append(P("dp"))

            def body(q, c, *rest):
                rest = list(rest)
                scale = rest.pop(0) if quantized else None
                mask = rest.pop(0) if masked else None
                return shard_search(q, c, scale, mask, k=k)

            fn = jax.shard_map(body, mesh=mesh, in_specs=tuple(specs),
                               out_specs=(P(), P()), check_vma=False)
            return fn(*args)

        return search

    # ------------------------------------------------------------------
    def _search_pending(self, qd, k: int):
        """Exact top-k over the post-build pending docs (same kernel, small
        slab). The slab pads to a power-of-two multiple of block_size so the
        jit compile count stays logarithmic in pending growth."""
        if self._pending_arr is None or self._pending_dirty:
            host_dtype = np.int8 if self.quantize == "int8" else np.float32
            pend = np.concatenate(self._chunks, axis=0)
            n = pend.shape[0]
            blocks = -(-n // self.block_size)
            n_pad = self.block_size * (1 << max(0, (blocks - 1).bit_length()))
            padded = np.zeros((n_pad, self.dim), host_dtype)
            padded[:n] = pend
            if self.quantize == "int8":
                scales = np.ones((n_pad,), np.float32)
                scales[:n] = np.concatenate(self._scale_chunks)
                self._pending_scales = jnp.asarray(scales)
                self._pending_arr = jnp.asarray(padded)
            else:
                self._pending_arr = jnp.asarray(padded, self.dtype)
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
        vals, idx = jax.device_get(          # one batched fetch, not two
            blockmax_topk(qd, self._pending_arr, self._pending_count,
                          k=k, block_size=self.block_size,
                          slab_size=self.slab_size,
                          corpus_scale=self._pending_scales,
                          row_mask=self._pending_mask))
        return vals.astype(np.float32), idx

    def search_embeddings(self, query_embeddings, k: int = 10
                          ) -> Tuple[List[np.ndarray], List[List[str]]]:
        """(per-query score arrays, per-query doc-id lists), original order.

        The scores are ALWAYS a list of 1-D float32 arrays (row q aligned with
        ids[q]); rows may be shorter than k when the index holds fewer valid
        docs. A consistent ragged return beats an ndarray that silently turns
        into a list on the rare under-filled-index case."""
        q = np.asarray(query_embeddings, np.float32)
        if q.size == 0:  # empty batch (incl. 1-D np.asarray([])) — no work
            return [], []
        if self._corpus is None and self._chunks:
            raise RuntimeError(
                "search before build(): added embeddings are still pending — "
                "call build() first (searching now would silently return "
                "zero hits)")
        if self.live_count == 0:
            return ([np.zeros((0,), np.float32) for _ in q], [[] for _ in q])
        qd = jnp.asarray(q, self.dtype)
        if self.normalize:
            qd = normalize(qd)
        k = min(k, self.live_count)
        # one batched D2H fetch: the dev relay charges a ~30 ms round trip
        # PER np.asarray; device_get on the tuple fetches both in one
        vals, idx = jax.device_get(self._search_fn(qd, k))
        vals = vals.astype(np.float32)
        idx = np.asarray(idx)
        if self._chunks:
            # docs added after build(): scan the pending slab too (exact same
            # kernel, small static-shape slab) and merge candidates host-side.
            p_vals, p_idx = self._search_pending(qd, k)
            vals = np.concatenate([vals, p_vals], axis=1)
            idx = np.concatenate([idx, p_idx + self._built_count], axis=1)
            order = np.argsort(-vals, axis=1, kind="stable")[:, :k]
            vals = np.take_along_axis(vals, order, axis=1)
            idx = np.take_along_axis(idx, order, axis=1)
        # -inf filler slots (masked padding) carry index 0 — trim scores AND
        # ids together so row-wise zip stays aligned
        finite = vals > -1e29
        ids = [[self._ids[int(i)] for i, ok in zip(row_i, row_f) if ok]
               for row_i, row_f in zip(idx, finite)]
        return [row_v[row_f] for row_v, row_f in zip(vals, finite)], ids

    def __len__(self) -> int:
        return self.live_count

    @property
    def is_built(self) -> bool:
        """True once build() has placed a searchable corpus on device."""
        return self._corpus is not None

    @property
    def pending_docs(self) -> int:
        """Live docs added since the last build() (pending-slab scanned)."""
        dead = sum(1 for p in self._deleted if p >= self._built_count)
        return self._count - self._built_count - dead

    # -- persistence --------------------------------------------------------
    def save(self, path: str):
        """Persist all docs (built + pending) to one .npz: a restarted server
        skips re-encoding its corpus (the expensive half of serving startup).
        int8 rows and their scales round-trip verbatim — save/load adds zero
        quantization error. Reference has no index persistence at all (it
        re-embeds per run, beir_dense_retriever.py caches raw embeddings)."""
        rows, scales = [], []
        if self._corpus is not None:
            built = np.asarray(self._corpus[: self._built_count])
            rows.append(built.astype(
                np.int8 if self.quantize == "int8" else np.float32))
            if self.quantize == "int8":
                scales.append(np.asarray(self._scales[: self._built_count],
                                         np.float32))
        rows.extend(self._chunks)
        scales.extend(self._scale_chunks)
        all_rows = (np.concatenate(rows) if rows
                    else np.zeros((0, self.dim),
                                  np.int8 if self.quantize == "int8"
                                  else np.float32))
        all_scales = (np.concatenate(scales) if scales
                      else np.zeros((0,), np.float32))
        save_ids = self._ids
        if self._deleted:  # persist compacted: tombstones never hit disk
            all_rows, all_scales, save_ids = _compact_deleted(
                all_rows, all_scales, self._ids, self._deleted,
                self.quantize == "int8")
        payload = {
            "rows": all_rows,
            "ids": _encode_ids(save_ids),
            "meta": np.bytes_(json.dumps({
                "kind": "dense", "dim": self.dim,
                "normalize": self.normalize, "quantize": self.quantize,
                "block_size": self.block_size, "dtype": np.dtype(self.dtype).name,
                "count": len(save_ids), "built": self._corpus is not None,
            }).encode()),
        }
        if self.quantize == "int8":
            payload["scales"] = all_scales
        np.savez(path, **payload)

    @classmethod
    def load(cls, path: str, *, mesh=None, **kw) -> "DenseIndex":
        """Restore a save()d index; rebuilds the device corpus (pad + H2D —
        the cheap half) and re-runs build() if it was built when saved."""
        z = np.load(path)
        meta = json.loads(bytes(z["meta"]))
        if meta.get("kind") != "dense":
            raise ValueError(f"{path} holds a {meta.get('kind')!r} index; "
                             "use the matching class to load it")
        idx = cls(meta["dim"], normalize_embeddings=meta["normalize"],
                  quantize=meta["quantize"], block_size=meta["block_size"],
                  dtype=np.dtype(meta["dtype"]), mesh=mesh, **kw)
        rows = z["rows"]
        if rows.shape[0]:
            idx._chunks = [rows]
            if meta["quantize"] == "int8":
                idx._scale_chunks = [z["scales"]]
        idx._ids = _decode_ids(z["ids"], meta["count"])
        idx._count = meta["count"]
        if meta["built"] and rows.shape[0]:
            idx.build()
        return idx


def index_corpus(engine, corpus, *, mesh=None, batch_docs: int = 50_000,
                 normalize_embeddings: bool = True, **index_kw) -> DenseIndex:
    """Embed a BEIR-shaped corpus ({docid: {title, text}}) into a DenseIndex.

    The embed→index half of the engine: streams the corpus through the
    EmbeddingEngine in chunks (longest-first, like retrieval) and accumulates
    the index, ready for `search_embeddings`.
    """
    doc_ids = sorted(
        corpus, key=lambda d: len(corpus[d].get("title", "") + corpus[d].get("text", "")),
        reverse=True) if isinstance(corpus, dict) else list(range(len(corpus)))
    get = corpus.__getitem__  # works for dict (by id) and list (by position)

    index = DenseIndex(engine.out_dim, mesh=mesh,
                       normalize_embeddings=normalize_embeddings, **index_kw)
    for s in range(0, len(doc_ids), batch_docs):
        chunk = doc_ids[s : s + batch_docs]
        emb = engine.encode_corpus([get(d) for d in chunk])
        index.add(emb, ids=[str(d) for d in chunk])
    return index.build()
