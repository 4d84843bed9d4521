"""Zero-shot cross-encoder reranking: score(query, doc) = log P(query | prompt(doc)).

TPU-native rebuild of the reference's `GPTRanker` + `_loglikelihood_tokens`
(crossencoder/beir/sgptce.py:150-341). Behavioral parity points:

  * main prompt "G": 'Documents are searched to find matches with the same
    content.\nThe document "{doc}" is a good search result for "' (sgptce.py:74),
  * left-truncation of (context+continuation) that PRESERVES the instruction
    prefix: (ctx[:ilen] + (ctx[ilen:] + cont)[-(max_len+1-ilen):])[:-1]
    (sgptce.py:199-205),
  * length-descending ordering with request dedup (Reorderer, sgptce.py:102-129),
  * score = sum of continuation-token log-probs (sgptce.py:237-260),
  * optional vocab sub-selection and few-shot prefixes (sgptce.py:227,311-316).

TPU-first differences: rows pack into static (batch, bucket) shapes so each
bucket compiles once; the forward+score is one fused jit (ops/logprobs).
"""
from __future__ import annotations

import logging
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.config import DecoderConfig
from .ops.logprobs import continuation_scores_gathered
from .tokenization.base import Tokenizer
from .tokenization.specb import DEFAULT_BUCKETS, pick_bucket, row_bucket

logger = logging.getLogger(__name__)

# In-flight dispatches before their D2H fetch (see encoder.FETCH_PIPELINE_DEPTH).
FETCH_PIPELINE_DEPTH = 2

PROMPT_G = ('Documents are searched to find matches with the same content.\n'
            'The document "{}" is a good search result for "')


class CrossEncoderRanker:
    """predict([(query, doc), ...]) -> list of log-prob scores."""

    def __init__(self, params, cfg: DecoderConfig, tokenizer: Tokenizer, *,
                 prompt_doc: str = PROMPT_G, use_prompt: bool = True,
                 fewshots: Optional[Tuple[str, str]] = None,
                 prompt_doc_start: str = "{}\n{}\n",
                 batch_size: int = 16, max_length: Optional[int] = None,
                 vocab_subset: Optional[Sequence[int]] = None,
                 quantize: Optional[str] = None, mesh=None,
                 pack_t: Optional[int] = None):
        if quantize is not None:
            # int8 decoder projections (ops/quant.py): ~1.4x at GPT-J/BLOOM
            # dims AND halves weight HBM — 6B CE fits one 16GB v5e chip
            # without TP. Scores shift by the quantization error; rankings
            # agree with bf16 to high overlap (tests/test_quant.py).
            # The caller's float tree stays intact (copying quantizer); for
            # ~6B trees pre-quantize with free_source=True instead (CLIs do).
            if quantize != "int8":
                raise ValueError(f"unknown quantize mode {quantize!r}; "
                                 "supported: 'int8'")
            from .ops.quant import quantize_decoder_params
            params = quantize_decoder_params(params)
        self.quantize = quantize
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.prompt_doc = prompt_doc
        self.use_prompt = use_prompt
        self.batch_size = batch_size
        self.max_length = max_length or cfg.max_position_embeddings

        # SEQUENCE PACKING: rows shorter than pack_t//2 bin-pack several to a
        # row (block-diagonal attention + per-segment positions,
        # models/decoder segment_ids) so ragged short-pair mixes fill every
        # row to ~pack_t instead of paying the length-bucket padding. pack_t
        # caps the dense (T, T) attention overcompute: at pack_t=256 the
        # attention term is ~T/(3D) ~ 11% of layer FLOPs at 125M width (less
        # at flagship widths), so cross-segment score waste stays marginal
        # while the linear-term padding waste goes to ~zero.
        self.pack_t = pack_t
        if pack_t is not None:
            if not 32 <= pack_t <= cfg.max_position_embeddings:
                raise ValueError(
                    f"pack_t={pack_t} out of range [32, "
                    f"{cfg.max_position_embeddings}]")

        # tokens before the doc slot are the protected instruction prefix
        self.instruction_len = len(tokenizer.encode(
            prompt_doc[: prompt_doc.index("{")])) if use_prompt else 0
        self.fewshot_prefix = ""
        if fewshots:
            if not use_prompt:
                # predict() builds the context WITHOUT the prefix when
                # use_prompt=False, but instruction_len would still count it,
                # pinning the document head as if it were instruction
                raise ValueError("fewshots require use_prompt=True")
            self.fewshot_prefix = prompt_doc_start.format(fewshots[0], fewshots[1])
            self.instruction_len += len(tokenizer.encode(self.fewshot_prefix))

        self.vocab_mask = None
        if vocab_subset is not None:
            vm = np.zeros((cfg.vocab_size,), bool)
            vm[np.asarray(list(vocab_subset))] = True
            self.vocab_mask = jnp.asarray(vm)

        # Data-parallel rerank over a device mesh: batches shard over dp, so
        # rerank throughput scales with the mesh instead of one chip's — the
        # reference's ONLY multi-device inference is exactly this workload
        # (sgptce.py:54-60 device_map layer sharding; here dp replication
        # rides ICI and the BEIR top-100 × every-query sweep splits rows).
        # TP-sharded params compose: jit's automatic partitioning handles the
        # projection collectives (row batches still shard over dp).
        self.mesh = mesh
        self._data_sharding = None
        self._mesh_score = None
        self._tp_mesh = None
        self._packed_mesh_fns: dict = {}  # n_seg -> shard_map'd packed scorer
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._data_sharding = NamedSharding(mesh, P("dp", None))
            pure_dp = all(n == 1 or ax == "dp" for ax, n in mesh.shape.items())
            if self.cfg.fused_attention and not pure_dp:
                # tp>1: the jitted scorer wraps the fused kernel in a nested
                # shard_map per head-shard (decoder gates on HD/tp VMEM fit —
                # GPT-J width becomes kernel-legal exactly under TP)
                self._tp_mesh = mesh
            elif self.cfg.fused_attention and pure_dp:
                # pure-dp: run the fused scorer under shard_map (per shard
                # it is just a smaller batch; no SPMD rule needed). The
                # vocab mask is a small per-ranker constant — close over it.
                from .ops.logprobs import continuation_scores_gathered as _csg
                inner = partial(_csg.__wrapped__, cfg=self.cfg,
                                vocab_mask=self.vocab_mask)
                self._mesh_score = jax.jit(jax.shard_map(
                    lambda p, ids, am, cp, ct, cm: inner(p, ids, am, cp, ct, cm),
                    mesh=mesh,
                    in_specs=(P(), P("dp", None), P("dp", None),
                              P("dp", None), P("dp", None), P("dp", None)),
                    out_specs=P("dp"), check_vma=False))

    # ------------------------------------------------------------------
    def _pack(self, context_enc: List[int], continuation_enc: List[int]):
        """Instruction-preserving left truncation (sgptce.py:199-205)."""
        ilen = min(self.instruction_len, len(context_enc))
        if ilen + len(continuation_enc) > self.max_length + 1:
            # the protected instruction prefix plus the continuation exceed
            # the window: truncation would eat continuation tokens while the
            # caller still scores the FULL continuation, gathering log-probs
            # at positions inside the instruction (silently-garbage scores;
            # the reference has the same latent misalignment — we raise, as
            # the len(cont) > max_length guard in score_pairs already does)
            raise ValueError(
                f"instruction ({ilen} tokens) + continuation "
                f"({len(continuation_enc)}) exceed max_length+1 "
                f"({self.max_length + 1}): continuation tokens would be "
                "truncated away — shorten the instruction/few-shot prefix "
                "or raise max_length")
        body = (context_enc[ilen:] + continuation_enc)[-(self.max_length + 1 - ilen):]
        inp = (context_enc[:ilen] + body)[:-1]
        return inp, len(inp), len(continuation_enc)

    # segments per packed row; bounds the one-hot segment reduction and the
    # jit-compile S buckets (continuation_scores_packed n_seg static arg)
    PACK_SEG_CAP = 16
    # first-fit-decreasing runs inside windows of this many rows: O(n*bins)
    # FFD over a whole BEIR rerank (1M pairs) would be quadratic; windowed
    # FFD over length-sorted input loses almost nothing (neighbors in sorted
    # order are the natural bin partners anyway)
    PACK_FFD_WINDOW = 2048

    def _packed_mesh_fn(self, n_seg: int):
        """dp-shard_map'd packed scorer, cached per n_seg bucket (n_seg is a
        static arg of continuation_scores_packed, so each bucket is its own
        compiled wrapper)."""
        fn = self._packed_mesh_fns.get(n_seg)
        if fn is None:
            from jax.sharding import PartitionSpec as P
            from .ops.logprobs import continuation_scores_packed as _csp
            inner = partial(_csp.__wrapped__, cfg=self.cfg, n_seg=n_seg,
                            vocab_mask=self.vocab_mask)
            fn = jax.jit(jax.shard_map(
                lambda p, *arrs: inner(p, *arrs),
                mesh=self.mesh,
                in_specs=(P(),) + (P("dp", None),) * 8,
                out_specs=P("dp", None), check_vma=False))
            self._packed_mesh_fns[n_seg] = fn
        return fn

    def _score_packed(self, keys, rows, uniq, scores):
        """Bin-pack short requests several-per-row and score per segment.

        keys/rows arrive length-descending with every inplen <= pack_t//2, so
        each bin holds >= 2 segments and first-fit-decreasing packs rows to
        near-full. Scores land in `scores` via the same uniq fan-out as the
        bucket path. Replaces padding waste the reference's fixed-row
        batching pays on short pairs (crossencoder/beir/sgptce.py:168,214-217)."""
        from .ops.logprobs import continuation_scores_packed

        T = self.pack_t
        bins: List[List] = []                      # [used, [(key, inp, inplen, contlen)]]
        for w0 in range(0, len(keys), self.PACK_FFD_WINDOW):
            window_bins: List[List] = []
            for key, (inp, inplen, contlen) in zip(
                    keys[w0 : w0 + self.PACK_FFD_WINDOW],
                    rows[w0 : w0 + self.PACK_FFD_WINDOW]):
                for b in window_bins:
                    if b[0] + inplen <= T and len(b[1]) < self.PACK_SEG_CAP:
                        b[0] += inplen
                        b[1].append((key, inp, inplen, contlen))
                        break
                else:
                    window_bins.append([inplen, [(key, inp, inplen, contlen)]])
            bins.extend(window_bins)

        budget = self.batch_size * self.max_length
        B = row_bucket(max(1, budget // T))
        if self.mesh is not None:
            dp = self.mesh.shape["dp"]
            B = ((max(B, dp) + dp - 1) // dp) * dp

        pending: List[Tuple[List, jax.Array]] = []

        def drain():
            pbins, pout = pending.pop(0)
            vals = np.asarray(pout, np.float64)
            for bi, segs in enumerate(pbins):
                for s, (key, _inp, _il, _cl) in enumerate(segs):
                    for orig in uniq[key]:
                        scores[orig] = vals[bi, s]

        i = 0
        while i < len(bins):
            batch = bins[i : i + min(B, len(bins) - i)]
            i += len(batch)
            S = pick_bucket(max(len(b[1]) for b in batch),
                            (2, 4, 8, 16), self.PACK_SEG_CAP)
            maxcont = max(sum(seg[3] for seg in b[1]) for b in batch)
            C = pick_bucket(maxcont, (8, 16, 32, 64, 128, 256), T)
            C = max(C, maxcont)

            ids = np.zeros((B, T), np.int32)
            amask = np.zeros((B, T), np.int32)
            posids = np.zeros((B, T), np.int32)
            segids = np.full((B, T), -1, np.int32)
            cpos = np.zeros((B, C), np.int32)
            ctgt = np.zeros((B, C), np.int32)
            cmask = np.zeros((B, C), np.float32)
            cseg = np.zeros((B, C), np.int32)
            for bi, (_used, segs) in enumerate(batch):
                off = 0
                cslot = 0
                for s, (key, inp, inplen, contlen) in enumerate(segs):
                    ids[bi, off : off + inplen] = inp
                    amask[bi, off : off + inplen] = 1
                    posids[bi, off : off + inplen] = np.arange(inplen)
                    segids[bi, off : off + inplen] = s
                    cont_ids = list(key[1])[-contlen:]
                    cpos[bi, cslot : cslot + contlen] = np.arange(
                        off + inplen - contlen, off + inplen)
                    ctgt[bi, cslot : cslot + contlen] = cont_ids
                    cmask[bi, cslot : cslot + contlen] = 1.0
                    cseg[bi, cslot : cslot + contlen] = s
                    cslot += contlen
                    off += inplen

            arrays = (jnp.asarray(ids), jnp.asarray(amask), jnp.asarray(posids),
                      jnp.asarray(segids), jnp.asarray(cpos), jnp.asarray(ctgt),
                      jnp.asarray(cmask), jnp.asarray(cseg))
            if self.mesh is not None:
                arrays = tuple(jax.device_put(a, self._data_sharding)
                               for a in arrays)
            if self.mesh is None or self._tp_mesh is not None:
                # single device, or tp>1: the decoder's fused layer nests its
                # own per-head-shard shard_map; jit's automatic partitioning
                # owns the dp row split
                out = continuation_scores_packed(
                    self.params, *arrays, self.cfg, S, self.vocab_mask,
                    tp_mesh=self._tp_mesh)
            elif self.cfg.fused_attention:
                # pure-dp + fused kernel: pallas_call has no GSPMD rule, so
                # (like the unpacked _mesh_score) run the scorer under a dp
                # shard_map — per shard it is just a smaller packed batch
                out = self._packed_mesh_fn(S)(self.params, *arrays)
            else:
                # pure-dp, XLA attention: automatic partitioning suffices
                out = continuation_scores_packed(
                    self.params, *arrays, self.cfg, S, self.vocab_mask)
            pending.append(([b[1] for b in batch], out))
            if len(pending) >= FETCH_PIPELINE_DEPTH:
                drain()
        while pending:
            drain()

    def score_pairs(self, pairs: Sequence[Tuple[str, str]]) -> List[float]:
        """pairs: (continuation, context) token-level requests, already prompted."""
        # one batched tokenize per column (HF fast tokenizers parallelize
        # the batch across host cores; ids match per-text encode)
        enc_batch = getattr(self.tokenizer, "encode_batch", None)
        if enc_batch is not None and pairs:
            cont_rows = enc_batch([c for c, _ in pairs])
            ctx_rows = enc_batch([x for _, x in pairs])
        else:
            cont_rows = [self.tokenizer.encode(c) for c, _ in pairs]
            ctx_rows = [self.tokenizer.encode(x) for _, x in pairs]
        enc = []
        for (continuation, context), cont, ctx in zip(pairs, cont_rows,
                                                      ctx_rows):
            if context == "":
                ctx = [self.tokenizer.eos_id]
            if not cont:
                cont = [self.tokenizer.eos_id]
            # the reference asserts this (sgptce.py:173); silently wrapping
            # would scatter targets into wrong columns
            if len(cont) > self.max_length:
                raise ValueError(
                    f"continuation has {len(cont)} tokens but max_length is "
                    f"{self.max_length} (sgptce.py asserts the same bound)")
            enc.append((ctx, cont))

        # dedupe + length-descending order (Reorderer semantics)
        uniq: Dict[Tuple, List[int]] = {}
        for i, (ctx, cont) in enumerate(enc):
            uniq.setdefault((tuple(ctx), tuple(cont)), []).append(i)
        keys = sorted(uniq, key=lambda kc: -len(kc[0] + kc[1]))

        scores = np.zeros(len(enc), np.float64)
        # Token-budget batching: rows per dispatch scale inversely with the
        # length bucket, so every dispatch feeds the MXU roughly the same
        # token count. The reference uses a FIXED row count regardless of
        # length (sgptce.py:168) — short-doc batches underfill the device;
        # measured 1.6x pairs/s on a ragged BEIR-like length mix
        # (tools/bench_ce_ragged.py, docs/PERF.md). batch_size keeps its
        # reference meaning: rows per dispatch at full max_length.
        budget = self.batch_size * self.max_length
        packed = [self._pack(list(c), list(t)) for c, t in keys]
        if self.pack_t is not None:
            # short rows leave the bucket path for the bin-packed path; the
            # length-descending order survives the partition in both halves
            half = self.pack_t // 2
            short = [j for j in range(len(keys)) if packed[j][1] <= half]
            if short:
                short_set = set(short)
                long_idx = [j for j in range(len(keys)) if j not in short_set]
                self._score_packed([keys[j] for j in short],
                                   [packed[j] for j in short], uniq, scores)
                keys = [keys[j] for j in long_idx]
                packed = [packed[j] for j in long_idx]
        # depth-2 fetch pipeline (same as EmbeddingEngine.encode): dispatch is
        # async, so deferring each batch's D2H by one step overlaps batch i's
        # compute with host-side packing of batch i+1 and the fetch RPC
        pending: List[Tuple[List, jax.Array]] = []

        def drain():
            pbatch, pout = pending.pop(0)
            vals = np.asarray(pout, np.float64)
            for bi, key in enumerate(pbatch):
                for orig in uniq[key]:
                    scores[orig] = vals[bi]

        i = 0
        while i < len(keys):
            # keys are length-descending: the first row's bucket fits all
            T = pick_bucket(packed[i][1], DEFAULT_BUCKETS, self.max_length)
            T = max(T, packed[i][1])
            B = row_bucket(max(1, budget // T),
                           allow_overshoot=T < self.max_length)
            if self.mesh is not None:
                # rows must split evenly over the dp axis (pad rows reuse the
                # same compile; their scores are discarded below)
                dp = self.mesh.shape["dp"]
                B = ((max(B, dp) + dp - 1) // dp) * dp
            batch = keys[i : i + min(B, len(keys) - i)]
            rows = packed[i : i + len(batch)]
            i += len(batch)
            # static continuation-window bucket: the LM head runs only on
            # these C positions (ops/logprobs.continuation_scores_gathered) —
            # the (B, T, 50k) logits tensor never materializes
            maxcont = max(r[2] for r in rows)
            C = pick_bucket(maxcont, (8, 16, 32, 64, 128, 256), T)
            C = max(C, maxcont)

            ids = np.zeros((B, T), np.int32)
            cpos = np.zeros((B, C), np.int32)
            ctgt = np.zeros((B, C), np.int32)
            cmask = np.zeros((B, C), np.float32)
            for bi, ((ctx, cont), (inp, inplen, contlen)) in enumerate(zip(batch, rows)):
                ids[bi, :inplen] = inp
                # logits at position t predict token t+1: the continuation
                # occupies input positions [inplen-contlen, inplen) in the
                # shifted frame (sgptce.py diagram at :175-181)
                cont_ids = list(batch[bi][1])[-contlen:]
                cpos[bi, :contlen] = np.arange(inplen - contlen, inplen)
                ctgt[bi, :contlen] = cont_ids
                cmask[bi, :contlen] = 1.0
            # causal attention: right padding cannot influence scored positions,
            # so a full-ones mask is safe (the reference passes no mask at all)
            amask = np.ones((B, T), np.int32)
            arrays = (jnp.asarray(ids), jnp.asarray(amask), jnp.asarray(cpos),
                      jnp.asarray(ctgt), jnp.asarray(cmask))
            if self.mesh is not None:
                arrays = tuple(jax.device_put(a, self._data_sharding)
                               for a in arrays)
            if self._mesh_score is not None:
                out = self._mesh_score(self.params, *arrays)
            else:
                out = continuation_scores_gathered(
                    self.params, *arrays, self.cfg, self.vocab_mask,
                    tp_mesh=self._tp_mesh)
            pending.append((batch, out))
            if len(pending) >= FETCH_PIPELINE_DEPTH:
                drain()
        while pending:
            drain()
        return scores.tolist()

    def predict(self, sentences: Sequence[Tuple[str, str]],
                batch_size: Optional[int] = None, **kw) -> List[float]:
        """sentences: (query, document) pairs — query is the scored continuation."""
        del batch_size  # fixed at construction (jit bucket reuse)
        requests = []
        for query, doc in sentences:
            ctx = (self.fewshot_prefix + self.prompt_doc.format(doc)
                   if self.use_prompt else doc)
            requests.append((query, ctx))
        return self.score_pairs(requests)


PROMPT_YESNO = ('An intelligent, helpful bot is given. The bot responds "Yes" '
                'if the document is a fit to the query and "No" otherwise.\n###\n'
                'Document: {}\nQuery: {}\nBot:')


class YesNoRanker(CrossEncoderRanker):
    """Yes/No classifier variant (the reference's GPTYesRanker, prompt "L"
    ablation — crossencoder_beir_sgpt.ipynb): score = log P("Yes" | doc, query)
    with the softmax restricted to the {Yes, No} vocabulary."""

    def __init__(self, params, cfg, tokenizer, *, prompt_doc: str = PROMPT_YESNO,
                 continuation: str = " Yes",
                 sub_select_voc: Sequence[str] = (" Yes", " No"), **kw):
        vocab_ids: List[int] = []
        for word in sub_select_voc:
            vocab_ids.extend(tokenizer.encode(word))
        kw.setdefault("vocab_subset", vocab_ids)
        super().__init__(params, cfg, tokenizer, prompt_doc=prompt_doc, **kw)
        self.continuation = continuation
        if self.fewshot_prefix:
            # the reference appends the expected answer to the few-shot
            # example and tokenizes the WHOLE string once (GPTYesRanker:
            # fewshots = start.format(...) + continuation, then
            # instruction_len += len(tokenize(fewshots))) — summing separate
            # encodes would miscount across BPE merge boundaries
            # (e.g. 'Bot: ' + 'Yes' retokenizes as ...' Yes')
            prompt_part = (len(tokenizer.encode(
                prompt_doc[: prompt_doc.index("{")]))
                if self.use_prompt else 0)
            self.fewshot_prefix += continuation
            self.instruction_len = prompt_part + len(
                tokenizer.encode(self.fewshot_prefix))

    def predict(self, sentences: Sequence[Tuple[str, str]],
                batch_size: Optional[int] = None, **kw) -> List[float]:
        requests = []
        for query, doc in sentences:
            ctx = self.fewshot_prefix + self.prompt_doc.format(doc, query)
            requests.append((self.continuation, ctx))
        return self.score_pairs(requests)


def rerank(ranker: CrossEncoderRanker, corpus: Dict[str, Dict[str, str]],
           queries: Dict[str, str], first_stage: Dict[str, Dict[str, float]],
           top_k: int = 100) -> Dict[str, Dict[str, float]]:
    """Rerank first-stage (e.g. BM25) results — beir.reranking.Rerank equivalent
    (driven at sgptce.py:365,390)."""
    pairs, keys = [], []
    for qid, hits in first_stage.items():
        docs = sorted(hits.items(), key=lambda x: -x[1])[:top_k]
        for did, _ in docs:
            doc = corpus[did]
            text = (doc.get("title", "") + " " + doc.get("text", "")).strip()
            pairs.append((queries[qid], text))
            keys.append((qid, did))
    logger.info("Reranking %d pairs", len(pairs))
    scores = ranker.predict(pairs)
    out: Dict[str, Dict[str, float]] = {qid: {} for qid in first_stage}
    for (qid, did), sc in zip(keys, scores):
        out[qid][did] = float(sc)
    return out
