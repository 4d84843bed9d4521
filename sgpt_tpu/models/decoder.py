"""Unified TPU-native GPT decoder forward (GPT-Neo / GPT-J / BLOOM).

Pure-functional JAX: params are a pytree of stacked per-layer arrays and the layer
stack runs under `lax.scan` (one trace/compile regardless of depth — XLA-friendly,
unlike the reference's per-layer Python module loop through HF transformers).

Behavioral parity targets (so HF checkpoints reproduce published scores):
  * GPT-Neo:  learned positions, alternating global/local(window) attention,
              UNSCALED attention scores, fp32 softmax.
  * GPT-J:    rotary on the first `rotary_dim` dims (rotate-every-two layout),
              parallel residual (attn + mlp from the same layernorm), 1/sqrt(d) scores.
  * BLOOM:    ALiBi bias added to scores pre-softmax (not scaled), embedding
              layernorm, sequential residual.

`output_hidden_states=True` matches the HF tuple semantics the SGPT drivers rely on
(ref: biencoder/beir/beir_dense_retriever.py:205): entry 0 is the embedding output,
entries 1..N-1 are block outputs, entry N is ln_f(last block output).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .config import DecoderConfig

NEG_INF = -1e9  # python float: module-level jnp scalars initialize the backend at import


# ---------------------------------------------------------------------------
# Primitive blocks
# ---------------------------------------------------------------------------

def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float) -> jax.Array:
    """LayerNorm with fp32 statistics regardless of activation dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def rms_norm(x: jax.Array, scale: jax.Array, eps: float) -> jax.Array:
    """T5 RMSNorm: no mean subtraction, no bias; fp32 statistics."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)
            * scale.astype(jnp.float32)).astype(x.dtype)


def _norm(x: jax.Array, p: dict, cfg: DecoderConfig) -> jax.Array:
    if cfg.norm_style == "rms":
        return rms_norm(x, p["scale"], cfg.layer_norm_eps)
    return layer_norm(x, p["scale"], p["bias"], cfg.layer_norm_eps)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """The tanh-approx GELU all three families use (HF `gelu_new` / BloomGelu)."""
    return jax.nn.gelu(x, approximate=True)


def rope_sincos(positions: jax.Array, rotary_dim: int):
    """GPT-J style sin/cos tables, repeat-interleaved by 2.
    positions: (T,) shared across the batch, or (B, T) per-row (sequence
    packing restarts positions at each segment boundary)."""
    inv_freq = 1.0 / (10000.0 ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq            # (..., T, rd/2)
    sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1)                           # (..., T, rd)
    cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1)
    return sin, cos


def _rotate_every_two(x: jax.Array) -> jax.Array:
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rotary(x: jax.Array, sin: jax.Array, cos: jax.Array, rotary_dim: int) -> jax.Array:
    """x: (B, T, H, Dh); rotary applied to the leading `rotary_dim` of Dh.
    sin/cos: (T, rd) batch-shared or (B, T, rd) per-row."""
    rot, rest = x[..., :rotary_dim], x[..., rotary_dim:]
    if sin.ndim == 2:
        sin, cos = sin[None], cos[None]
    sin = sin[:, :, None, :].astype(rot.dtype)
    cos = cos[:, :, None, :].astype(rot.dtype)
    rot = rot * cos + _rotate_every_two(rot) * sin
    return jnp.concatenate([rot, rest], axis=-1)


def t5_relative_bias(rel_table: jax.Array, T: int, num_buckets: int,
                     max_distance: int, bidirectional: bool) -> jax.Array:
    """(1, H, T, T) fp32 additive bias from the (num_buckets, H) table.

    HF `T5Attention._relative_position_bucket` semantics: half the buckets
    (bidirectional) split by sign of (key - query); within each half, the
    first max_exact distances get their own bucket and larger ones bucket
    logarithmically up to max_distance. All T5 layers share layer 0's bias.
    """
    ctx = jnp.arange(T)
    rel = ctx[None, :] - ctx[:, None]                     # key - query (T, T)
    nb = num_buckets
    bucket = jnp.zeros((T, T), jnp.int32)
    if bidirectional:
        nb = nb // 2
        bucket = bucket + (rel > 0).astype(jnp.int32) * nb
        rel_abs = jnp.abs(rel)
    else:
        rel_abs = jnp.clip(-rel, 0, None)
    max_exact = nb // 2
    is_small = rel_abs < max_exact
    # max(.,1) guards log(0) in the branch where() discards (rel_abs <
    # max_exact rows take the exact bucket)
    large = max_exact + (
        jnp.log(jnp.maximum(rel_abs, 1).astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    bucket = bucket + jnp.where(is_small, rel_abs, large)
    bias = jnp.take(rel_table.astype(jnp.float32), bucket, axis=0)  # (T,T,H)
    return bias.transpose(2, 0, 1)[None]                  # (1, H, T, T)


def alibi_slopes(num_heads: int) -> jax.Array:
    """BLOOM's per-head ALiBi slopes (closest-power-of-two interpolation)."""
    cp2 = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(cp2) - 3)))
    slopes = [base ** (i + 1) for i in range(cp2)]
    if cp2 != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * cp2) - 3)))
        slopes += [extra_base ** (i + 1) for i in range(0, 2 * (num_heads - cp2), 2)]
    return jnp.asarray(slopes, dtype=jnp.float32)


def build_alibi_bias(attention_mask: jax.Array, num_heads: int,
                     positions: Optional[jax.Array] = None) -> jax.Array:
    """(B, H, 1, T) bias = slope_h * key_position, matching HF `build_alibi_tensor`.
    positions: optional (B, T) override — sequence packing restarts key
    positions at each segment boundary (cumsum-of-mask would keep counting
    across packed segments)."""
    if positions is None:
        positions = (jnp.cumsum(attention_mask, axis=-1) - 1) * attention_mask  # (B, T)
    slopes = alibi_slopes(num_heads)                                            # (H,)
    return slopes[None, :, None, None] * positions[:, None, None, :].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Attention / MLP
# ---------------------------------------------------------------------------

def _project(x, w, b):
    if isinstance(w, dict):  # int8-quantized leaf {"q", "s"} (ops/quant.py)
        from ..ops.quant import int8_project
        y = int8_project(x, w)
    else:
        y = jnp.einsum("btd,df->btf", x, w.astype(x.dtype))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _qkv(x: jax.Array, p: dict, cfg: DecoderConfig, rope: Optional[tuple]):
    B, T, _ = x.shape
    H, Dh = cfg.num_heads, cfg.head_size
    q = _project(x, p["wq"], p.get("bq")).reshape(B, T, H, Dh)
    k = _project(x, p["wk"], p.get("bk")).reshape(B, T, H, Dh)
    v = _project(x, p["wv"], p.get("bv")).reshape(B, T, H, Dh)
    if rope is not None:
        sin, cos = rope
        q = apply_rotary(q, sin, cos, cfg.rotary_dim)
        k = apply_rotary(k, sin, cos, cfg.rotary_dim)
    return q, k, v


def attention(x: jax.Array, p: dict, cfg: DecoderConfig, mask_bias: jax.Array,
              rope: Optional[tuple], alibi: Optional[jax.Array]) -> jax.Array:
    """Causal multi-head attention (XLA path; differentiable).
    mask_bias: (B, 1, T, T) additive fp32 bias."""
    B, T, _ = x.shape
    H, Dh = cfg.num_heads, cfg.head_size
    q, k, v = _qkv(x, p, cfg, rope)

    # Scores in fp32 (all three HF reference implementations do fp32 softmax).
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if cfg.scale_attn:
        scores = scores / jnp.float32(math.sqrt(Dh))
    if alibi is not None:
        scores = scores + alibi  # BLOOM: alibi added un-scaled, pre-mask
    scores = scores + mask_bias
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)

    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, H * Dh)
    return _project(out, p["wo"], p.get("bo"))


def flash_attention_layer(x: jax.Array, p: dict, cfg: DecoderConfig,
                          attention_mask: jax.Array, local_flag,
                          rope: Optional[tuple],
                          slopes: Optional[jax.Array]) -> jax.Array:
    """Causal attention via the Pallas flash kernel (differentiable:
    Pallas forward + blockwise-scan backward, flash_attention_trainable)."""
    from ..ops.pallas.flash_attention import flash_attention_trainable

    B, T, _ = x.shape
    H, Dh = cfg.num_heads, cfg.head_size
    q, k, v = _qkv(x, p, cfg, rope)
    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))  # (B, H, T, Dh)
    scale = 1.0 / math.sqrt(Dh) if cfg.scale_attn else 1.0
    block = 256 if T % 256 == 0 else 128

    def run(window: int):
        return flash_attention_trainable(q, k, v, attention_mask, slopes,
                                         scale, window, block)

    if any(cfg.local_flags()):
        out = jax.lax.cond(local_flag, lambda: run(cfg.local_window),
                           lambda: run(0))
    else:
        out = run(0)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
    return _project(out, p["wo"], p.get("bo"))


def fused_attention_layer(x: jax.Array, p: dict, cfg: DecoderConfig,
                          attention_mask: jax.Array, local_flag,
                          rope: Optional[tuple],
                          slopes: Optional[jax.Array],
                          tp_mesh=None, tp_axis: str = "tp",
                          segment_ids: Optional[jax.Array] = None,
                          positions: Optional[jax.Array] = None) -> jax.Array:
    """Causal attention via the fused short-T kernel
    (ops/pallas/short_attention.py): q/k/v stay in the (B, T, H*Dh)
    projection layout, the (T, T) scores never leave VMEM. ~1.8x the XLA
    path at BEIR encode shapes (docs/PERF.md).

    tp_mesh: with Megatron-TP-sharded params, the kernel runs under a
    shard_map over the mesh — each device's head slice (H/tp heads) is an
    independent attention problem, and q/k/v arrive ALREADY sharded
    P(dp, None, tp) from the GSPMD column-parallel projections, so the wrap
    costs zero resharding. The per-shard width HD/tp is what must fit VMEM:
    GPT-J's HD=4096 overflows the single-chip gate at T=304 but fits at
    tp>=2 — TP makes the kernel legal exactly at flagship width."""
    from ..ops.pallas.short_attention import short_attention

    B, T, _ = x.shape
    H, Dh = cfg.num_heads, cfg.head_size
    # same projection+rope as the XLA path (_qkv); the kernel wants the
    # flat (B, T, H*Dh) layout, a free reshape of _qkv's head-split view
    q, k, v = _qkv(x, p, cfg, rope)
    q = q.reshape(B, T, H * Dh)
    k = k.reshape(B, T, H * Dh)
    v = v.reshape(B, T, H * Dh)
    scale = 1.0 / math.sqrt(Dh) if cfg.scale_attn else 1.0
    use_alibi = slopes is not None
    sl = slopes if use_alibi else jnp.zeros((H,), jnp.float32)

    # packed rows: per-segment block-diagonal masks (and, for ALiBi, key
    # positions that restart at each segment) ride two extra (B, T) int32
    # kernel inputs; unpacked rows skip both (use_segments staticly off)
    packed = segment_ids is not None
    B_, T_ = attention_mask.shape
    kpos = None
    if use_alibi and positions is not None:
        kpos = jnp.broadcast_to(positions, (B_, T_)).astype(jnp.int32)

    if tp_mesh is None:
        def run(window: int):
            return short_attention(q, k, v, attention_mask, sl,
                                   scale, window, H, use_alibi,
                                   segments=segment_ids, positions=kpos)
    else:
        from jax.sharding import PartitionSpec as P
        tp = tp_mesh.shape[tp_axis]
        Hs = H // tp
        batch_axes = tuple(ax for ax, n in tp_mesh.shape.items()
                           if ax != tp_axis and n > 1) or None
        # shard_map can't thread None leaves: materialize the defaults the
        # wrapper would have built (zeros segs are masked out staticly-off;
        # arange kpos == the unpacked ALiBi key index)
        seg_arr = (segment_ids if packed
                   else jnp.zeros((B_, T_), jnp.int32))
        kpos_arr = (kpos if kpos is not None else jnp.broadcast_to(
            jnp.arange(T_, dtype=jnp.int32), (B_, T_)))

        def run(window: int):
            fn = jax.shard_map(
                lambda q_, k_, v_, m_, s_, sg_, kp_: short_attention(
                    q_, k_, v_, m_, s_, scale, window, Hs, use_alibi,
                    segments=sg_ if packed else None, positions=kp_),
                mesh=tp_mesh,
                in_specs=(P(batch_axes, None, tp_axis),
                          P(batch_axes, None, tp_axis),
                          P(batch_axes, None, tp_axis),
                          P(batch_axes, None), P(tp_axis),
                          P(batch_axes, None), P(batch_axes, None)),
                out_specs=P(batch_axes, None, tp_axis), check_vma=False)
            return fn(q, k, v, attention_mask, sl, seg_arr, kpos_arr)

    if any(cfg.local_flags()):
        out = jax.lax.cond(local_flag, lambda: run(cfg.local_window),
                           lambda: run(0))
    else:
        out = run(0)
    return _project(out, p["wo"], p.get("bo"))


def mlp(x: jax.Array, p: dict, cfg: DecoderConfig) -> jax.Array:
    h = _project(x, p["wi"], p.get("bi"))
    act = cfg.mlp_activation
    if act == "relu":                 # T5 v1.0
        h = jax.nn.relu(h)
    elif act == "gated_gelu":         # T5 v1.1: gelu(wi(x)) * wg(x)
        h = jax.nn.gelu(h, approximate=True) * _project(x, p["wg"], None)
    elif act == "quick_gelu":         # CLIP: x * sigmoid(1.702 x)
        h = h * jax.nn.sigmoid(1.702 * h)
    else:
        # BERT uses the exact erf GELU; the GPT families use the tanh approx
        h = jax.nn.gelu(h, approximate=not cfg.gelu_exact)
    return _project(h, p["wo"], p.get("bo"))


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

def _mask_bias(attention_mask: jax.Array, T: int, window: int, want_local: bool,
               causal: bool = True, segment_ids: Optional[jax.Array] = None):
    """Build (B,1,T,T) fp32 additive biases: (global, local or None).
    causal=False (BERT): only padding keys mask out.
    segment_ids: optional (B, T) — sequence packing: queries attend only to
    keys of the SAME segment (block-diagonal within the causal structure),
    so packed segments are mutually invisible."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    struct = (j <= i) if causal else jnp.ones((T, T), bool)
    keymask = attention_mask[:, None, None, :].astype(bool)          # (B,1,1,T)
    if segment_ids is not None:
        same_seg = (segment_ids[:, :, None] == segment_ids[:, None, :])
        keymask = jnp.logical_and(keymask, same_seg[:, None])        # (B,1,T,T)
    ok_global = jnp.logical_and(struct[None, None], keymask)
    bias_global = jnp.where(ok_global, 0.0, NEG_INF)
    if not want_local:
        return bias_global, None
    local = jnp.logical_and(struct, j > i - window)
    ok_local = jnp.logical_and(local[None, None], keymask)
    return bias_global, jnp.where(ok_local, 0.0, NEG_INF)


@partial(jax.jit, static_argnames=("cfg", "output_hidden_states", "sp_mesh",
                                   "sp_axis", "tp_mesh", "tp_axis"))
def forward(params: dict, input_ids: jax.Array, attention_mask: jax.Array,
            cfg: DecoderConfig, *, output_hidden_states: bool = False,
            position_ids: Optional[jax.Array] = None,
            segment_ids: Optional[jax.Array] = None,
            sp_mesh=None, sp_axis: str = "dp",
            tp_mesh=None, tp_axis: str = "tp",
            token_type_ids: Optional[jax.Array] = None,
            inputs_embeds: Optional[jax.Array] = None,
            cond: Optional[jax.Array] = None, cond_params: Optional[dict] = None):
    """Run the decoder.

    Returns final hidden states (B, T, D) after ln_f, or — with
    output_hidden_states — a stacked (L+1, B, T, D) array with HF tuple semantics.

    sp_mesh: optional Mesh for SEQUENCE parallelism — attention runs as ring
    attention over `sp_axis` (ops/ring_attention.py) so T scales with chips;
    everything token-local (embeds, layernorm, MLP) shards automatically.

    tp_mesh: with Megatron-TP-sharded params under a dp×tp mesh, lets the
    fused short-T attention kernel run per head-shard via shard_map (VMEM
    gate evaluates the per-shard width HD/tp — see fused_attention_layer);
    ignored when the fused kernel is off or the shape routes elsewhere.

    segment_ids: optional (B, T) — SEQUENCE PACKING: multiple independent
    texts share one row. Attention is block-diagonal (same-segment only),
    and position_ids should restart at each segment (pass them as (B, T)).
    Packed rows keep the fused short-T Pallas kernel (block-diagonal masks
    and per-segment ALiBi key positions are native kernel inputs since r5);
    flash/ring paths encode only causal+padding, so packed long-T rows fall
    back to the XLA path.

    cond/cond_params: TSDAE-style decoding conditioned on a (B, D) sentence
    embedding. The reference decodes with HF cross-attention to a SINGLE
    encoder token (losses/DenoisingAutoEncoderLoss.py:121-128); softmax over
    one key is identically 1, so that cross-attention degenerates exactly to a
    query-independent per-layer projection of the embedding — cond_params is
    the stacked {"w": (L, D, D), "b": (L, D)} projection, added into each
    block's residual after self-attention.
    """
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _forward_impl(params, input_ids, attention_mask, cfg,
                             output_hidden_states=output_hidden_states,
                             position_ids=position_ids,
                             segment_ids=segment_ids,
                             sp_mesh=sp_mesh, sp_axis=sp_axis,
                             tp_mesh=tp_mesh, tp_axis=tp_axis,
                             token_type_ids=token_type_ids,
                             inputs_embeds=inputs_embeds,
                             cond=cond, cond_params=cond_params)


def ring_attention_layer(x: jax.Array, p: dict, cfg: DecoderConfig,
                         attention_mask: jax.Array, local_flag,
                         rope: Optional[tuple], slopes: Optional[jax.Array],
                         mesh, axis: str) -> jax.Array:
    """Causal attention with the sequence axis sharded over `mesh[axis]`."""
    from ..ops.ring_attention import ring_attention

    B, T, _ = x.shape
    H, Dh = cfg.num_heads, cfg.head_size
    q, k, v = _qkv(x, p, cfg, rope)
    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    scale = 1.0 / math.sqrt(Dh) if cfg.scale_attn else 1.0

    def run(window: int):
        return ring_attention(q, k, v, attention_mask, slopes, mesh=mesh,
                              axis=axis, scale=scale, window=window)

    if any(cfg.local_flags()):
        out = jax.lax.cond(local_flag, lambda: run(cfg.local_window),
                           lambda: run(0))
    else:
        out = run(0)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)
    return _project(out, p["wo"], p.get("bo"))


def _forward_impl(params, input_ids, attention_mask, cfg, *,
                  output_hidden_states, position_ids, segment_ids=None,
                  sp_mesh=None,
                  sp_axis="dp", tp_mesh=None, tp_axis="tp",
                  token_type_ids=None, inputs_embeds=None,
                  cond=None, cond_params=None):
    dtype = cfg.dtype
    if inputs_embeds is not None:
        # pre-computed input embeddings (e.g. ViT patch embeddings for the
        # CLIP vision tower — models/clip.py); input_ids is ignored
        B, T = inputs_embeds.shape[:2]
        x = inputs_embeds.astype(dtype)
    else:
        B, T = input_ids.shape
        x = jnp.take(params["wte"], input_ids, axis=0).astype(dtype)
    if position_ids is None:
        positions = jnp.arange(T)
    else:
        positions = position_ids
    if cfg.position_embedding == "learned":
        x = x + jnp.take(params["wpe"], positions, axis=0).astype(dtype)
    if cfg.token_type_vocab:
        tt = (token_type_ids if token_type_ids is not None
              else jnp.zeros_like(input_ids))
        x = x + jnp.take(params["wtt"], tt, axis=0).astype(dtype)
    if cfg.embedding_layernorm:
        x = layer_norm(x, params["emb_ln"]["scale"], params["emb_ln"]["bias"],
                       cfg.layer_norm_eps)

    rope = None
    if cfg.position_embedding == "rotary":
        rope = rope_sincos(positions, cfg.rotary_dim)

    use_sp = sp_mesh is not None
    if cfg.bidirectional and use_sp:
        raise NotImplementedError(
            "ring attention is causal-only; BERT sp encode is unsupported")
    packed = segment_ids is not None
    if packed and use_sp:
        raise NotImplementedError(
            "sequence packing (segment_ids) is unsupported under sp_mesh: "
            "ring attention encodes only the causal+padding structure")
    if packed and position_ids is None:
        raise ValueError(
            "segment_ids without position_ids: packed rows must carry (B, T) "
            "positions that restart at each segment boundary — global arange "
            "positions would shift every non-first segment's frame")
    # flash implements only the causal+padding mask; encoder (bidirectional)
    # models and PACKED rows take the XLA or fused path (the fused short-T
    # kernel carries block-diagonal segment masks natively since r5)
    if cfg.relative_attention and use_sp:
        raise NotImplementedError(
            "relative position bias (T5) is unsupported under sp_mesh")
    use_flash = (cfg.use_flash and T % 128 == 0 and not use_sp
                 and not cfg.bidirectional and not packed
                 and not cfg.relative_attention)
    # fused short-T kernel: VMEM-resident scores. Lower cap because below
    # T~160 the (T, T) score traffic XLA pays is small enough that the
    # kernel's per-layer invocation overhead loses (measured A/B at T=75
    # training: XLA 1184 vs fused ~1040 ex/s; crossover between 128 and 160,
    # fused wins 1.2-1.8x from T=160 up — docs/PERF.md). Upper bound is the
    # kernel's VMEM residency — a function of T AND the projection width
    # (GPT-J's (T=304, HD=4096) blocks overflow the 16 MB VMEM where 125M's
    # fit; short_attention.fwd_fits_vmem) — plus a T cap keeping the (T, T)
    # score tile economical. The flag can stay on everywhere; the shape
    # picks the faster path.
    use_fused = False
    tp_size = 1
    if tp_mesh is not None:
        tp_size = tp_mesh.shape[tp_axis]
        if tp_size == 1 or cfg.num_heads % tp_size:
            tp_mesh, tp_size = None, 1  # head slices must align; fall back
    if (cfg.fused_attention and not use_sp and not use_flash
            and not cfg.bidirectional
            and not cfg.relative_attention and 160 <= T <= 512):
        from ..ops.pallas.short_attention import fwd_fits_vmem
        # under TP the kernel runs per head-shard (shard_map), so the VMEM
        # residency is a function of the SHARD width HD/tp — GPT-J at tp=2
        # fits where the full HD=4096 does not (fused_attention_layer)
        use_fused = fwd_fits_vmem(
            T, cfg.num_heads * cfg.head_size // tp_size,
            jnp.dtype(cfg.dtype).itemsize)
    alibi = None
    slopes = None
    if cfg.position_embedding == "alibi":
        if use_flash or use_sp or use_fused:
            slopes = alibi_slopes(cfg.num_heads)
        else:
            # packed rows: key positions restart per segment (position_ids
            # carries the per-segment frame), matching each segment's
            # standalone ALiBi bias exactly
            alibi = build_alibi_bias(attention_mask, cfg.num_heads,
                                     positions=positions if packed else None)

    any_local = any(cfg.local_flags())
    if use_flash or use_sp or use_fused:
        bias_global = bias_local = None
    else:
        bias_global, bias_local = _mask_bias(attention_mask, T, cfg.local_window,
                                             any_local,
                                             causal=not cfg.bidirectional,
                                             segment_ids=segment_ids)
    if cfg.relative_attention:
        # shared-by-all-layers bias folds straight into the mask bias.
        # Correct under packing too: the bias depends only on (key - query)
        # distance, which is frame-independent within a segment, and
        # cross-segment pairs are already masked to NEG_INF.
        bias_global = bias_global + t5_relative_bias(
            params["rel_bias"], T, cfg.relative_attention_buckets,
            cfg.relative_attention_max_distance, cfg.bidirectional)
    is_local = jnp.asarray(cfg.local_flags())

    layers = params["layers"]

    def block(x, xs):
        if cond is None:
            p, local_flag = xs
            cp = None
        else:
            p, local_flag, cp = xs
        if cfg.post_layernorm:
            # BERT block: attention on the RAW residual stream, LayerNorm
            # AFTER each residual add (HF BertLayer ordering)
            attn_out = attention(x, p["attn"], cfg, bias_global, rope, alibi)
            x = _norm(x + attn_out, p["ln1"], cfg)
            mlp_out = mlp(x, p["mlp"], cfg)
            x = _norm(x + mlp_out, p["ln2"], cfg)
            return x, (x if output_hidden_states else None)
        h1 = _norm(x, p["ln1"], cfg)
        if use_sp:
            attn_out = ring_attention_layer(h1, p["attn"], cfg, attention_mask,
                                            local_flag, rope, slopes,
                                            sp_mesh, sp_axis)
        elif use_flash:
            attn_out = flash_attention_layer(h1, p["attn"], cfg, attention_mask,
                                             local_flag, rope, slopes)
        elif use_fused:
            attn_out = fused_attention_layer(
                h1, p["attn"], cfg, attention_mask, local_flag, rope, slopes,
                tp_mesh=tp_mesh if tp_size > 1 else None, tp_axis=tp_axis,
                segment_ids=segment_ids,
                positions=positions if packed else None)
        else:
            if bias_local is not None:
                mask_bias = jnp.where(local_flag, bias_local, bias_global)
            else:
                mask_bias = bias_global
            attn_out = attention(h1, p["attn"], cfg, mask_bias, rope, alibi)
        if cond is not None:
            # degenerate single-token cross-attention (see forward docstring):
            # a learned projection of the sentence embedding, same at every
            # position, joins the residual after self-attention
            proj = cond.astype(x.dtype) @ cp["w"].astype(x.dtype) + \
                cp["b"].astype(x.dtype)
            attn_out = attn_out + proj[:, None, :]
        if cfg.parallel_residual:
            mlp_out = mlp(h1, p["mlp"], cfg)
            x = x + attn_out + mlp_out
        else:
            x = x + attn_out
            h2 = _norm(x, p["ln2"], cfg)
            x = x + mlp(h2, p["mlp"], cfg)
        return x, (x if output_hidden_states else None)

    x0 = x
    xs = (layers, is_local) if cond is None else (layers, is_local, cond_params)
    x, ys = jax.lax.scan(block, x, xs)
    if cfg.post_layernorm:
        final = x  # BERT: each block ends on its own LayerNorm; no ln_f
    else:
        final = _norm(x, params["ln_f"], cfg)

    if output_hidden_states:
        # HF semantics: [embeddings, block_1..block_{N-1} outputs, ln_f(block_N)]
        hidden = jnp.concatenate([x0[None], ys[:-1], final[None]], axis=0)
        return hidden
    return final


def logits(params: dict, hidden: jax.Array, cfg: DecoderConfig) -> jax.Array:
    """LM head. GPT-Neo ties to wte; GPT-J/BLOOM may carry a separate head."""
    if "lm_head" in params:
        w = params["lm_head"]["w"]
        out = jnp.einsum("btd,dv->btv", hidden, w.astype(hidden.dtype))
        if "b" in params["lm_head"]:
            out = out + params["lm_head"]["b"].astype(hidden.dtype)
        return out
    return jnp.einsum("btd,vd->btv", hidden, params["wte"].astype(hidden.dtype))
