"""Decoder architecture configs.

One unified config covers the three GPT families the SGPT reference drives through
HuggingFace transformers (ref: biencoder/beir/beir_dense_retriever.py:123,
crossencoder/beir/sgptce.py:54-60): GPT-Neo (learned positions, alternating
global/local attention, unscaled attention scores), GPT-J (rotary embeddings,
parallel residual, no attention biases) and BLOOM (ALiBi, embedding layernorm,
fused head-major QKV in the checkpoint).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """Static architecture description of a causal decoder-only transformer."""

    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    max_position_embeddings: int = 2048
    intermediate_size: Optional[int] = None  # default: 4 * hidden_size
    head_dim: Optional[int] = None           # default: hidden_size // num_heads

    # Position encoding: "learned" (GPT-Neo), "rotary" (GPT-J), "alibi" (BLOOM).
    position_embedding: str = "learned"
    rotary_dim: Optional[int] = None         # GPT-J: 64

    # Attention layout: "global" everywhere, or "alternating" global/local
    # (GPT-Neo: even layers global, odd layers local with a 256-token window).
    attention_layout: str = "global"
    local_window: int = 256

    # Score scaling: GPT-Neo uses none; GPT-J and BLOOM use 1/sqrt(head_dim).
    scale_attn: bool = True

    # GPT-J applies attention and MLP to the same layernorm output and sums both
    # into the residual ("parallel residual"); Neo/BLOOM are sequential.
    parallel_residual: bool = False

    # BLOOM applies a layernorm to the token embeddings before the first block.
    embedding_layernorm: bool = False

    qkv_bias: bool = False                   # BLOOM: True
    out_bias: bool = True                    # GPT-J: False
    layer_norm_eps: float = 1e-5

    # BERT-family structural flags (SURVEY §1 L1 lists BERT among the
    # backbones: the reference's ST fork drives BERT baselines through the
    # same Transformer module — models/Transformer.py:30-40). The unified
    # forward covers it with four switches:
    bidirectional: bool = False              # no causal mask (encoder model)
    post_layernorm: bool = False             # LN AFTER residual add (BERT)
    token_type_vocab: int = 0                # >0: add token-type embeddings
    gelu_exact: bool = False                 # erf GELU (BERT) vs tanh approx

    # T5-family switches (the ST fork ships models.T5 — an encoder-only T5
    # token embedder, sentence_transformers/models/T5.py — and CLIP; both are
    # expressed as structural switches on this one transformer rather than
    # as separate model classes):
    norm_style: str = "layer"                # "rms": no mean-subtract, no bias
    relative_attention: bool = False         # T5 bucketed relative pos bias
    relative_attention_buckets: int = 32
    relative_attention_max_distance: int = 128
    # MLP activation: None = GELU (tanh approx unless gelu_exact), "relu"
    # (T5 v1.0), "gated_gelu" (T5 v1.1: gelu(wi(x)) * wg(x)), "quick_gelu"
    # (CLIP: x * sigmoid(1.702 x)).
    mlp_activation: Optional[str] = None
    mlp_bias: bool = True                    # T5: no biases anywhere
    dtype: jnp.dtype = jnp.float32           # activation/compute dtype
    # Matmul precision for fp32 inputs. XLA's "default" runs fp32 matmuls in
    # reduced (bf16-class) precision on TPU, which breaks checkpoint parity;
    # "highest" keeps true fp32. Serving casts to bf16 where this is moot.
    matmul_precision: str = "highest"
    # Use the Pallas flash-attention kernel (ops/pallas/flash_attention.py) when
    # sequence length permits (T % 128 == 0). Differentiable (custom VJP).
    use_flash: bool = False
    # Use the fused short-T attention kernel (ops/pallas/short_attention.py)
    # when T <= 512: keeps the (T, T) scores in VMEM — measured ~1.8x faster
    # than the XLA attention at the BEIR encode shape (docs/PERF.md).
    # Differentiable (custom VJP recomputes via XLA). EmbeddingEngine enables
    # this automatically on the TPU backend.
    fused_attention: bool = False

    @property
    def head_size(self) -> int:
        return self.head_dim if self.head_dim is not None else self.hidden_size // self.num_heads

    @property
    def mlp_size(self) -> int:
        return self.intermediate_size if self.intermediate_size is not None else 4 * self.hidden_size

    def local_flags(self) -> Tuple[bool, ...]:
        """Per-layer is-local-attention flags."""
        if self.attention_layout == "alternating":
            return tuple(i % 2 == 1 for i in range(self.num_layers))
        return tuple(False for _ in range(self.num_layers))

    def replace(self, **kw) -> "DecoderConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Presets for the model families the reference evaluates (README.md model list).
# ---------------------------------------------------------------------------

def gpt_neo(size: str = "125m", **kw) -> DecoderConfig:
    dims = {
        "125m": dict(hidden_size=768, num_layers=12, num_heads=12),
        "1.3b": dict(hidden_size=2048, num_layers=24, num_heads=16),
        "2.7b": dict(hidden_size=2560, num_layers=32, num_heads=20),
    }[size]
    return DecoderConfig(
        vocab_size=50257,
        position_embedding="learned",
        attention_layout="alternating",
        local_window=256,
        scale_attn=False,
        qkv_bias=False,
        out_bias=True,
        **dims,
        **kw,
    )


def gpt_j_6b(**kw) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=50400,
        hidden_size=4096,
        num_layers=28,
        num_heads=16,
        position_embedding="rotary",
        rotary_dim=64,
        parallel_residual=True,
        scale_attn=True,
        qkv_bias=False,
        out_bias=False,
        **kw,
    )


def bloom(size: str = "1b7", **kw) -> DecoderConfig:
    dims = {
        "560m": dict(hidden_size=1024, num_layers=24, num_heads=16),
        "1b7": dict(hidden_size=2048, num_layers=24, num_heads=16),
        "3b": dict(hidden_size=2560, num_layers=30, num_heads=32),
        "7b1": dict(hidden_size=4096, num_layers=30, num_heads=32),
    }[size]
    return DecoderConfig(
        vocab_size=250880,
        position_embedding="alibi",
        embedding_layernorm=True,
        scale_attn=True,
        qkv_bias=True,
        out_bias=True,
        **dims,
        **kw,
    )


def bert(size: str = "base", **kw) -> DecoderConfig:
    """BERT encoder presets (bert-base/large-uncased geometry). Baseline
    parity: the reference's NLI/MSMARCO training entries accept any HF name
    (training_nli_v2.py model_name arg), BERT included."""
    dims = {
        "base": dict(hidden_size=768, num_layers=12, num_heads=12),
        "large": dict(hidden_size=1024, num_layers=24, num_heads=16),
    }[size]
    return DecoderConfig(
        vocab_size=30522,
        max_position_embeddings=512,
        position_embedding="learned",
        scale_attn=True,
        qkv_bias=True,
        out_bias=True,
        layer_norm_eps=1e-12,
        bidirectional=True,
        post_layernorm=True,
        embedding_layernorm=True,
        token_type_vocab=2,
        gelu_exact=True,
        **dims,
        **kw,
    )


def t5(size: str = "base", **kw) -> DecoderConfig:
    """T5 ENCODER presets (t5-small/base/large geometry, v1.0 ReLU MLP).

    Backs the ST fork's models.T5 token embedder
    (sentence_transformers/models/T5.py:36-46: `t5model.encoder(...)` only —
    the decoder half is never used for sentence embeddings). Structure:
    RMSNorm (pre-LN, eps 1e-6), bucketed relative position bias shared
    across layers, UNSCALED attention scores (the 1/sqrt(d) is folded into
    T5's init), no biases anywhere, no absolute position embeddings.
    For v1.1 (`google/t5-v1_1-*`) pass mlp_activation='gated_gelu'."""
    dims = {
        "small": dict(hidden_size=512, num_layers=6, num_heads=8,
                      intermediate_size=2048, head_dim=64),
        "base": dict(hidden_size=768, num_layers=12, num_heads=12,
                     intermediate_size=3072, head_dim=64),
        "large": dict(hidden_size=1024, num_layers=24, num_heads=16,
                      intermediate_size=4096, head_dim=64),
    }[size]
    return DecoderConfig(
        vocab_size=32128,
        max_position_embeddings=512,
        position_embedding="none",
        scale_attn=False,
        qkv_bias=False,
        out_bias=False,
        layer_norm_eps=1e-6,
        bidirectional=True,
        norm_style="rms",
        relative_attention=True,
        mlp_activation="relu",
        mlp_bias=False,
        **dims,
        **kw,
    )


def tiny(family: str = "neo", vocab_size: int = 257, **kw) -> DecoderConfig:
    """Small configs for tests; same structural flags as the full families."""
    base = dict(vocab_size=vocab_size, hidden_size=64, num_layers=4, num_heads=4,
                max_position_embeddings=128)
    base.update(kw)
    if family == "neo":
        return DecoderConfig(position_embedding="learned", attention_layout="alternating",
                             local_window=8, scale_attn=False, **base)
    if family == "gptj":
        return DecoderConfig(position_embedding="rotary", rotary_dim=8,
                             parallel_residual=True, out_bias=False, **base)
    if family == "bloom":
        return DecoderConfig(position_embedding="alibi", embedding_layernorm=True,
                             qkv_bias=True, **base)
    if family == "bert":
        return DecoderConfig(position_embedding="learned", scale_attn=True,
                             qkv_bias=True, layer_norm_eps=1e-12,
                             bidirectional=True, post_layernorm=True,
                             embedding_layernorm=True, token_type_vocab=2,
                             gelu_exact=True, **base)
    if family == "t5":
        return DecoderConfig(position_embedding="none", scale_attn=False,
                             out_bias=False, layer_norm_eps=1e-6,
                             bidirectional=True, norm_style="rms",
                             relative_attention=True,
                             relative_attention_buckets=8,
                             relative_attention_max_distance=16,
                             mlp_activation="relu", mlp_bias=False,
                             head_dim=16, **base)
    raise ValueError(f"unknown family {family!r}")
