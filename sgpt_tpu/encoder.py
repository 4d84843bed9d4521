"""EmbeddingEngine — the jit-compiled batched encode path.

TPU-native counterpart of the reference's two encode stacks
(`CustomEmbedder.embed_batcher`, biencoder/beir/beir_dense_retriever.py:225-306,
and `SentenceTransformer.encode`, sentence_transformers/SentenceTransformer.py:107-210):

  * tokenize → SPECB brackets → static length-bucket padding (one compile per
    (batch, seqlen) bucket instead of ragged pad-to-longest),
  * decoder forward + pooling + optional L2-normalize fused in ONE jit — the
    hidden states never leave the device (the reference round-trips every batch's
    full hidden-state stack to host, beir_dense_retriever.py:221),
  * length-sorted batch formation (SentenceTransformer.py:148-149) to minimize
    padding waste, un-sorted on output,
  * optional layer-index selection (--layeridx sweeps, useb_dense_retriever.py)
    and all-layer pooling methods,
  * on-disk embedding cache for resumability (the pickle-per-chunk pattern,
    beir_dense_retriever.py:311-338).
"""
from __future__ import annotations

import hashlib
import logging
import os
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .models.config import DecoderConfig
from .models.decoder import forward
from .ops.pooling import POOLERS, STACK_POOLERS, learned_weighted_mean_pool, normalize
from .tokenization.base import Tokenizer
from .tokenization.specb import SpecbCodec, pick_bucket, row_bucket

logger = logging.getLogger(__name__)

# How many dispatched batches may be in flight before their D2H fetch.
# 2 = double buffering (host packs batch i+1 while the device runs batch i);
# 1 = fully synchronous (the pre-pipelining behavior, used for A/B benches).
FETCH_PIPELINE_DEPTH = 2


_ACTIVATIONS = {
    "identity": lambda x: x,
    "gelu": lambda x: jax.nn.gelu(x, approximate=True),
    "tanh": jnp.tanh,
}


def _apply_heads(x, head_params, activations):
    """Linear heads (models/Dense.py:23-50 equivalent): x @ w [+ b] → act."""
    for p, act in zip(head_params, activations):
        x = x @ p["w"].astype(x.dtype)
        if "b" in p:
            x = x + p["b"].astype(x.dtype)
        x = _ACTIVATIONS[act](x)
    return x


@partial(jax.jit, static_argnames=("cfg", "method", "layeridx", "do_normalize",
                                   "has_learned_weights", "pre_acts", "post_acts",
                                   "sp_mesh", "tp_mesh"))
def _embed_step(params, heads, input_ids, mask, learned_weights,
                cfg: DecoderConfig, method: str, layeridx: int,
                do_normalize: bool, has_learned_weights: bool,
                pre_acts: tuple = (), post_acts: tuple = (), sp_mesh=None,
                tp_mesh=None):
    """One fused forward+(heads)+pool step. All shapes static.

    heads = {"pre": [{w[,b]}...], "post": [...]} — linear layers applied to
    token embeddings before pooling (--linearthenpool) or to the sentence
    embedding after (training_nli_v2.py:105-117).

    sp_mesh: sequence-parallel mesh — attention runs as ring attention with
    T sharded over the mesh (the long-context serving path).

    tp_mesh: dp×tp mesh with Megatron-sharded params — lets the fused
    attention kernel run per head-shard at widths whose full HD overflows
    VMEM (models/decoder.fused_attention_layer)."""
    needs_stack = (method in STACK_POOLERS) or (layeridx not in (-1, cfg.num_layers))
    if needs_stack:
        stack = forward(params, input_ids, mask, cfg, output_hidden_states=True,
                        sp_mesh=sp_mesh, tp_mesh=tp_mesh)
        if method in STACK_POOLERS:
            emb = STACK_POOLERS[method](stack, mask)
        else:
            hidden = _apply_heads(stack[layeridx], heads.get("pre", ()), pre_acts)
            emb = _pool_single(hidden, mask, method, learned_weights,
                               has_learned_weights)
    else:
        hidden = forward(params, input_ids, mask, cfg, sp_mesh=sp_mesh,
                         tp_mesh=tp_mesh)
        hidden = _apply_heads(hidden, heads.get("pre", ()), pre_acts)
        emb = _pool_single(hidden, mask, method, learned_weights, has_learned_weights)
    emb = _apply_heads(emb, heads.get("post", ()), post_acts)
    if do_normalize:
        emb = normalize(emb)
    return emb


@partial(jax.jit, static_argnames=("cfg", "method", "layeridx", "do_normalize",
                                   "has_learned_weights", "pre_acts",
                                   "post_acts"))
def _embed_chain_step(params, heads, ids_stack, mask_stack, learned_weights,
                      cfg: DecoderConfig, method: str, layeridx: int,
                      do_normalize: bool, has_learned_weights: bool,
                      pre_acts: tuple = (), post_acts: tuple = ()):
    """k same-shape batches in ONE dispatch (EmbeddingEngine dispatch_chain):
    lax.map runs _embed_step's exact math per (ids, mask) slice — one compile
    per (k, B, T) shape, one host round-trip per k batches instead of k.
    Same pattern as bench.py's 8-batches-per-dispatch loop."""
    def one(im):
        return _embed_step.__wrapped__(
            params, heads, im[0], im[1], learned_weights, cfg, method,
            layeridx, do_normalize, has_learned_weights, pre_acts, post_acts)
    return jax.lax.map(one, (ids_stack, mask_stack))


def _chain_group_sizes(shapes: Sequence[tuple], chain: int) -> list:
    """Plan dispatch-chain grouping over a batch stream of known shapes.

    Returns sizes[i] = size of the chain group STARTING at batch i (0 for
    continuation members). Each maximal run of same-shape batches is
    decomposed greedily into descending power-of-two groups capped at the
    largest power of two <= chain (n=13, chain=8 -> 8+4+1), so compiles
    stay bounded at log2(chain)+1 shapes per bucket while runs shorter
    than the full chain still coalesce."""
    cap = 1
    while cap * 2 <= max(1, chain):
        cap *= 2
    sizes = [0] * len(shapes)
    i = 0
    while i < len(shapes):
        j = i
        while j < len(shapes) and shapes[j] == shapes[i]:
            j += 1
        n, p, g = j - i, i, cap
        while n:
            while g > n:
                g //= 2
            sizes[p] = g
            p += g
            n -= g
        i = j
    return sizes


def _pool_single(hidden, mask, method, learned_weights, has_learned_weights):
    if method == "learned_weightedmean" or (has_learned_weights and method == "weightedmean"):
        return learned_weighted_mean_pool(hidden, mask, learned_weights)
    return POOLERS[method](hidden, mask)


class EmbeddingEngine:
    """Batched sentence embedding over a GPT decoder."""

    def __init__(
        self,
        params,
        cfg: DecoderConfig,
        tokenizer: Tokenizer,
        *,
        method: str = "weightedmean",
        specb: bool = False,
        layeridx: int = -1,
        max_seq_len: Optional[int] = None,
        batch_size: int = 32,
        normalize_embeddings: bool = False,
        learned_weights: Optional[jax.Array] = None,
        dense_heads: Optional[list] = None,
        cache_dir: Optional[str] = None,
        mesh=None,
        sp_mesh=None,
        fused_attention: Optional[bool] = None,
        quantize: Optional[str] = None,
        text_prefix: str = "",
        dispatch_chain: int = 8,
    ):
        """mesh: data-parallel encode (batch shards over dp). sp_mesh:
        SEQUENCE-parallel encode — ring attention over the mesh axis for docs
        longer than one chip's attention budget (mutually exclusive with mesh;
        T must divide by the sp axis size, so pick max_seq_len accordingly).

        fused_attention: None (default) = auto — enable the fused short-T
        kernel on TPU backends (measured ~1.8x the XLA attention at BEIR
        encode shapes, docs/PERF.md); True/False force it on/off.

        quantize: "int8" replaces the decoder's projection kernels with
        per-channel int8 + dynamic per-token activation quantization
        (ops/quant.py) — ~1.4x encode throughput at 2.7B dims on the MXU's
        double-rate int8 path, cosine vs bf16 >= 0.999. Not worth it below
        ~1B params (the per-token quantize overhead beats the matmul saving
        at small hidden sizes; measured 0.93x at 125M — docs/PERF.md).
        The caller's float tree is left intact (the quantizer copies); for
        ~6B trees whose float+int8 copies exceed HBM together, pre-quantize
        with `quantize_decoder_params(params, free_source=True)` and pass
        the result here with quantize=None (what the CLIs do).

        dispatch_chain: bulk-encode dispatch batching — consecutive
        SAME-shape (batch, bucket) batches run in ONE jit (lax.map),
        saving (g-1) dispatch round-trips and fetching one stacked array
        per group. The grouping is PLANNED from the sorted lengths before
        any dispatch: each same-shape run splits into descending
        power-of-two groups capped at dispatch_chain (13 batches ->
        8+4+1), so compiles stay bounded at log2(chain)+1 shapes per
        bucket and lone batches dispatch immediately with zero buffering
        delay. Single-device path only; dp/sp meshes dispatch per batch.
        1 disables."""
        if mesh is not None and sp_mesh is not None:
            raise ValueError("pass either mesh (dp encode) or sp_mesh "
                             "(sequence-parallel long-context encode), not both")
        if fused_attention is None:
            # auto: on for single-device, pure-dp meshes (embed step under
            # shard_map — each shard runs the kernel on its batch slice) AND
            # tp meshes (the kernel runs per head-shard inside the jitted
            # forward via a nested shard_map; projections keep jit's
            # automatic TP partitioning — decoder.fused_attention_layer).
            fused_attention = (sp_mesh is None
                               and jax.default_backend() == "tpu")
        if fused_attention != cfg.fused_attention:
            cfg = cfg.replace(fused_attention=fused_attention)
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(f"unknown quantize mode {quantize!r}; "
                                 "supported: 'int8'")
            from .ops.quant import quantize_decoder_params
            params = quantize_decoder_params(params)
        self.quantize = quantize
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.method = method
        self.layeridx = layeridx
        self.batch_size = batch_size
        self.dispatch_chain = max(1, int(dispatch_chain))
        self.normalize = normalize_embeddings
        self.learned_weights = (learned_weights if learned_weights is not None
                                else jnp.zeros((0,), jnp.float32))
        self.has_learned_weights = learned_weights is not None
        self.cache_dir = cache_dir
        # dense_heads: list of dicts {"w", ["b"], "activation", "location"}
        self.heads = {"pre": [], "post": []}
        self.pre_acts, self.post_acts = [], []
        for h in dense_heads or []:
            loc = h.get("location", "post_pool")
            entry = {"w": jnp.asarray(h["w"])}
            if h.get("b") is not None:
                entry["b"] = jnp.asarray(h["b"])
            if loc == "pre_pool":
                self.heads["pre"].append(entry)
                self.pre_acts.append(h.get("activation", "identity"))
            else:
                self.heads["post"].append(entry)
                self.post_acts.append(h.get("activation", "identity"))
        if self.heads["pre"] and method in STACK_POOLERS:
            raise ValueError(
                f"pre_pool dense heads are not applied by stack poolers "
                f"({method!r} pools the all-layer stack directly); use a "
                "post_pool head or a single-layer pooling method")
        # output width follows application order (pre heads → pool → post
        # heads), NOT the list order of dense_heads: the last POST head wins
        # when both kinds exist
        if self.heads["post"]:
            self.out_dim = self.heads["post"][-1]["w"].shape[1]
        elif self.heads["pre"]:
            self.out_dim = self.heads["pre"][-1]["w"].shape[1]
        else:
            self.out_dim = cfg.hidden_size
        max_seq_len = max_seq_len or cfg.max_position_embeddings
        self.codec = SpecbCodec(tokenizer, max_seq_len=max_seq_len, specb=specb)
        # text_prefix: prepended to every text before tokenization — the ST
        # fork's models.T5 `task_identifier` semantics ("stsb sentence1: ",
        # sentence_transformers/models/T5.py:19,51); empty for other models.
        self.text_prefix = text_prefix

        # Multi-device data-parallel encode: batches shard over the mesh's dp
        # axis (replaces the reference's rank-sliced distributed encode +
        # mismatched all-gather, SentenceTransformer.py:153-175 — the gather is
        # implicit under single-controller jit). Params may additionally be
        # TP-sharded via parallel.shard_params before construction.
        self.mesh = mesh
        self.sp_mesh = sp_mesh
        self._mesh_step = None
        self._tp_mesh = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._data_sharding = NamedSharding(mesh, P("dp", None))
            dp = mesh.shape["dp"]
            if self.batch_size % dp:
                self.batch_size = ((self.batch_size + dp - 1) // dp) * dp
            pure_dp = all(n == 1 or ax == "dp" for ax, n in mesh.shape.items())
            if self.cfg.fused_attention and not pure_dp:
                # tp>1: the jitted forward wraps the fused kernel in a nested
                # shard_map per head-shard (decoder gates on HD/tp VMEM fit)
                self._tp_mesh = mesh
            if self.cfg.fused_attention and pure_dp:
                # pure-dp: run the embed step under shard_map so the fused
                # Pallas kernel works multi-device (it has no SPMD
                # partitioning rule under plain jit; per-shard it's just a
                # smaller batch). Params/heads replicate; batch shards.
                inner = partial(
                    _embed_step.__wrapped__, cfg=self.cfg, method=self.method,
                    layeridx=self.layeridx, do_normalize=self.normalize,
                    has_learned_weights=self.has_learned_weights,
                    pre_acts=tuple(self.pre_acts),
                    post_acts=tuple(self.post_acts), sp_mesh=None)
                self._mesh_step = jax.jit(jax.shard_map(
                    lambda p, h, ids, m, lw: inner(p, h, ids, m, lw),
                    mesh=mesh,
                    in_specs=(P(), P(), P("dp", None), P("dp", None), P()),
                    out_specs=P("dp", None), check_vma=False))

    # ------------------------------------------------------------------
    def _embed(self, ids_j, mask_j):
        if self._mesh_step is not None:
            return self._mesh_step(self.params, self.heads, ids_j, mask_j,
                                   self.learned_weights)
        return _embed_step(self.params, self.heads, ids_j, mask_j,
                           self.learned_weights, self.cfg,
                           self.method, self.layeridx, self.normalize,
                           self.has_learned_weights,
                           tuple(self.pre_acts), tuple(self.post_acts),
                           sp_mesh=self.sp_mesh, tp_mesh=self._tp_mesh)

    def _embed_many(self, ids_stack, mask_stack):
        """Chained bulk dispatch: (k, B, T) stacks of same-shape batches →
        (k, B, D) embeddings in one jit (see dispatch_chain)."""
        return _embed_chain_step(self.params, self.heads, ids_stack,
                                 mask_stack, self.learned_weights, self.cfg,
                                 self.method, self.layeridx, self.normalize,
                                 self.has_learned_weights,
                                 tuple(self.pre_acts), tuple(self.post_acts))

    def _rows_for_bucket(self, T: int) -> int:
        """Rows per dispatch for length bucket T (token-budget batching).

        budget = batch_size × max_seq_len tokens, so at full-length batches
        this reduces to exactly batch_size rows; shorter buckets take
        proportionally more rows. Pure function of T → one compile per
        bucket, like the fixed-rows scheme it replaces."""
        B = row_bucket(max(1, (self.batch_size * self.codec.max_seq_len) // T),
                       allow_overshoot=T < self.codec.max_seq_len)
        if self.mesh is not None:
            dp = self.mesh.shape["dp"]
            B = ((max(B, dp) + dp - 1) // dp) * dp
        return B

    def warmup(self, lengths: Optional[Sequence[int]] = None):
        """Precompile the (batch, bucket) shapes a serving deployment will hit
        (first-compile latency is seconds; pay it before traffic, not during)."""
        lengths = lengths or [b for b in self.codec.buckets
                              if b <= self.codec.max_seq_len]
        for T in lengths:
            B = self._rows_for_bucket(T)
            if self.sp_mesh is not None:
                # match encode(): T pads to a multiple of the sp axis size
                n = int(np.prod(list(self.sp_mesh.shape.values())))
                T = (T + n - 1) // n * n
            ids = np.zeros((B, T), np.int32)
            mask = np.ones((B, T), np.int32)
            ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)
            if self.mesh is not None:
                # match encode()'s input placement, or jit compiles for the
                # single-device layout and recompiles on first real traffic
                ids_j = jax.device_put(ids_j, self._data_sharding)
                mask_j = jax.device_put(mask_j, self._data_sharding)
            self._embed(ids_j, mask_j)
        return self

    def encode(self, texts: Sequence[str], *, is_query: bool = False,
               show_progress: bool = False) -> np.ndarray:
        """Embed a list of texts → (N, D) numpy array (original order)."""
        if len(texts) == 0:
            return np.zeros((0, self.out_dim), np.float32)

        cached = self._cache_load(texts, is_query)
        if cached is not None:
            return cached

        if self.text_prefix:
            texts = [self.text_prefix + t for t in texts]

        # Tokenize once, then token-budget batching: rows per dispatch scale
        # inversely with the length bucket so every dispatch feeds the MXU
        # ~the same token count (batch_size keeps the reference meaning of
        # rows-at-max_seq_len; short-text corpora like NLI/USEB no longer
        # underfill the device — measured speedup in docs/PERF.md). Sorting
        # is by exact token length (the reference sorts by char length,
        # SentenceTransformer.py:148).
        rows, n_trunc, toks_trunc = self.codec.encode_rows(texts,
                                                           is_query=is_query)
        if n_trunc:
            logger.warning("Truncated %d/%d docs by %d tokens",
                           n_trunc, len(texts), toks_trunc)
        order = np.argsort([-len(r) for r in rows], kind="stable")
        out = np.zeros((len(texts), self.out_dim), np.float32)
        # depth-2 fetch pipeline: jit dispatch is async, so deferring each
        # batch's D2H by one step lets host tokenize/pad batch i+1 and the
        # relay's per-fetch RPC (~30 ms measured) overlap batch i's compute
        # instead of serializing dispatch -> compute -> fetch per batch.
        # Each pending entry is (list_of_sels, (B,D) or (k,B,D) device array)
        # — a chained dispatch fetches its whole stack in ONE D2H.
        pending: list = []

        def drain():
            psels, pemb = pending.pop(0)
            arr = np.asarray(pemb, np.float32)
            if arr.ndim == 2:
                arr = arr[None]
            for j, psel in enumerate(psels):
                out[psel] = arr[j, : len(psel)]

        # dispatch chaining (bulk single-device path): the batch stream's
        # shapes are a pure function of the sorted lengths, so PLAN the
        # grouping before dispatching anything — maximal same-shape runs
        # decompose into descending power-of-two chain groups
        # (_chain_group_sizes). Singles dispatch immediately (zero buffering
        # delay when a bucket holds one batch — the common case for small
        # corpora under token-budget row sizing); larger groups run as ONE
        # lax.map jit, saving (g-1) dispatch round-trips each.
        chain = (self.dispatch_chain
                 if self.mesh is None and self.sp_mesh is None else 1)
        batches: list = []  # (sel, T) per dispatch, in stream order
        s = 0
        while s < len(order):
            T = pick_bucket(max(1, len(rows[order[s]])), self.codec.buckets,
                            self.codec.max_seq_len)
            T = max(T, len(rows[order[s]]))
            B = self._rows_for_bucket(T)
            sel = order[s : s + B]
            s += len(sel)
            batches.append((sel, T, B))
        group_sizes = _chain_group_sizes([(B, T) for _, T, B in batches],
                                         chain)

        g_ids: list = []
        g_masks: list = []
        g_sels: list = []
        g_target = 1

        for bi, (sel, T, B) in enumerate(batches):
            enc = self.codec.pad_rows([rows[i] for i in sel], pad_to=T)
            ids, mask = enc.input_ids, enc.attention_mask
            if self.sp_mesh is not None:
                # ring attention shards T over the mesh axis: right-pad the
                # bucket up to a multiple (pads are causally invisible)
                n = int(np.prod(list(self.sp_mesh.shape.values())))
                T = ids.shape[1]
                t_pad = (T + n - 1) // n * n - T
                if t_pad:
                    ids = np.pad(ids, ((0, 0), (0, t_pad)),
                                 constant_values=self.tokenizer.pad_id)
                    mask = np.pad(mask, ((0, 0), (0, t_pad)))
            if len(sel) < B:  # pad batch to static size (reuses the compile)
                pad = B - len(sel)
                ids = np.concatenate([ids, np.tile(ids[-1:], (pad, 1))])
                mask = np.concatenate([mask, np.tile(mask[-1:], (pad, 1))])
            ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)
            if self.mesh is not None:
                ids_j = jax.device_put(ids_j, self._data_sharding)
                mask_j = jax.device_put(mask_j, self._data_sharding)
            if group_sizes[bi]:
                g_target = group_sizes[bi]
            if g_target == 1:
                pending.append(([sel], self._embed(ids_j, mask_j)))
            else:
                g_ids.append(ids_j)
                g_masks.append(mask_j)
                g_sels.append(sel)
                if len(g_ids) == g_target:
                    embs = self._embed_many(jnp.stack(g_ids),
                                            jnp.stack(g_masks))
                    pending.append((list(g_sels), embs))
                    g_ids.clear(), g_masks.clear(), g_sels.clear()
            while len(pending) >= FETCH_PIPELINE_DEPTH:
                drain()
        while pending:
            drain()
        self._cache_store(texts, is_query, out)
        return out

    # ST-compat aliases (SentenceTransformer.encode / encode_queries / encode_corpus)
    def encode_queries(self, queries: Sequence[str], **kw) -> np.ndarray:
        kw.pop("batch_size", None)
        return self.encode(list(queries), is_query=True)

    def encode_corpus(self, corpus, **kw) -> np.ndarray:
        kw.pop("batch_size", None)
        texts = [
            (d.get("title", "") + " " + d["text"]).strip() if isinstance(d, dict) else d
            for d in corpus
        ]
        return self.encode(texts, is_query=False)

    # ------------------------------------------------------------------
    def _params_fingerprint(self) -> str:
        """Cheap identity for the weights (stale-cache guard when re-evaluating
        updated checkpoints under the same model name).

        Hashes shapes plus a small deterministic value sample from EVERY leaf —
        bias leaves included, so two BitFit checkpoints (bias-only updates,
        the reference's --freezenonbias headline mode) never collide."""
        if not hasattr(self, "_fp"):
            h = hashlib.sha1()
            samples = []
            # heads and learned pooling weights are part of the embedding
            # model's identity: two engines sharing a decoder but differing
            # in a dense head or learnt position weights must not share
            # cached embeddings (review finding)
            aux = (self.params, self.heads, self.learned_weights)
            # structure matters too: same weight arrays with a different
            # activation or pre/post location are a different model
            h.update(repr((tuple(self.pre_acts), tuple(self.post_acts),
                           len(self.heads["pre"]),
                           len(self.heads["post"]))).encode())
            for leaf in jax.tree.leaves(aux):
                h.update(str(leaf.shape).encode())
                # slice on device, fetch only 16 elements per leaf
                samples.append(jnp.ravel(leaf)[:16].astype(jnp.float32))
            for s in jax.device_get(samples):
                h.update(np.asarray(s).tobytes())
            self._fp = h.hexdigest()[:12]
        return self._fp

    def _cache_key(self, texts, is_query) -> Optional[str]:
        if not self.cache_dir:
            return None
        h = hashlib.sha1()
        h.update(f"{self.method}|{self.layeridx}|{self.codec.specb}|{is_query}|"
                 f"{self.normalize}|{self.codec.max_seq_len}|"
                 f"{self.text_prefix}|"
                 f"{self._params_fingerprint()}|{len(texts)}".encode())
        for t in texts:  # full-text coverage — templated corpora sharing long
            h.update(str(len(t)).encode())  # prefixes must not collide
            h.update(t.encode())
        return os.path.join(self.cache_dir, h.hexdigest() + ".npy")

    def _cache_load(self, texts, is_query):
        key = self._cache_key(texts, is_query)
        if key and os.path.exists(key):
            logger.info("Loaded embeddings from cache %s", key)
            return np.load(key)
        if key and os.path.isdir(self.cache_dir) and os.listdir(self.cache_dir):
            # Existing entries under a different key: different weights/config,
            # or entries written before a cache-key scheme change (the
            # fingerprint now covers heads/learned weights). Say so once per
            # engine rather than letting the re-encode read as a bug.
            if not getattr(self, "_warned_cache_miss", False):
                self._warned_cache_miss = True
                logger.info(
                    "Cache dir %s has %d entries but none match this engine's "
                    "key (different weights/config, or a pre-upgrade key "
                    "scheme) - re-encoding.", self.cache_dir,
                    len(os.listdir(self.cache_dir)))
        return None

    def _cache_store(self, texts, is_query, emb):
        key = self._cache_key(texts, is_query)
        if key:
            os.makedirs(self.cache_dir, exist_ok=True)
            np.save(key, emb)
