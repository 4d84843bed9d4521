"""Int8 quantized inference: per-channel weights × dynamic per-token activations.

TPU-native serving optimization with no reference counterpart (the reference
serves fp16/fp32 through torch, SURVEY.md §6 — it publishes no throughput
numbers at all). The v5e MXU runs int8×int8→int32 at ~2× the bf16 rate
(measured ~1.35× on the dev tile, docs/PERF.md), and the decoder's projection
matmuls are ~93% of encode FLOPs at T=304, so quantizing just the projections
captures most of the speedup while attention scores, softmax, layernorm and
pooling stay in bf16/fp32.

Scheme (standard symmetric int8, à la AQT):
  * weights: per-output-channel symmetric scales, s_w = max|w| / 127 over the
    contraction axis; quantized ONCE at load time.
  * activations: dynamic per-token (row) symmetric scales computed on the fly
    inside the jit — no calibration data needed.
  * accumulate in int32 on the MXU, rescale by s_x·s_w in fp32, cast back.

A quantized weight is a pytree leaf-dict {"q": int8, "s": f32 scales} — the
decoder's `_project` dispatches on it, so `forward` works unchanged with
quantized params (`quantize_decoder_params`). Quantized params are
inference-only; training always uses the float pytree.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def quantize_weight(w: jax.Array, contract_axis: int = 0) -> dict:
    """Symmetric per-output-channel int8 quantization of a weight matrix.

    contract_axis: the axis that the matmul contracts over (per-channel scales
    span every OTHER axis). For a stacked (L, D, F) layer weight pass 1.
    """
    w32 = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=contract_axis, keepdims=True)
    s = jnp.maximum(absmax / 127.0, _EPS)
    q = jnp.round(w32 / s).astype(jnp.int8)   # |w|/s ≤ 127 by construction
    return {"q": q, "s": s}


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def int8_project(x: jax.Array, qw: dict) -> jax.Array:
    """x @ W for a quantized W, via an int8×int8→int32 MXU dot.

    x: (..., D) float; qw: {"q": (D, F) int8, "s": (1, F) f32}.
    Activations are quantized dynamically per row (per token).
    """
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, _EPS)
    qx = jnp.round(x32 / sx).astype(jnp.int8)
    y = jax.lax.dot_general(
        qx, qw["q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * qw["s"]
    return y.astype(x.dtype)


_ATTN_KERNELS = ("wq", "wk", "wv", "wo")
_MLP_KERNELS = ("wi", "wo")


@jax.jit
def _quantize_stacked(w):
    """quantize_weight(contract_axis=1) for a stacked (L, D, F) kernel,
    computed ONE LAYER AT A TIME under jit: the fp32 intermediate is a
    single (D, F) slab (~270 MB at GPT-J's widest) instead of the full
    (L, D, F) stack (~7.5 GB)."""
    return jax.lax.map(lambda wl: quantize_weight(wl, contract_axis=0), w)


def quantize_decoder_params(params: dict, *, free_source: bool = False) -> dict:
    """Quantize the per-layer projection kernels of a decoder params pytree.

    Embeddings, layernorms, biases and the LM head stay float: they are a
    negligible FLOP share and (for ln/embeddings) quality-critical. The
    stacked (L, D, F) layer kernels get per-layer, per-output-channel scales
    (contract_axis=1 semantics), so `lax.scan` slices {"q": (D,F), "s": (1,F)}
    per layer.

    free_source=False (default): returns a NEW tree; the caller's float tree
    is untouched (safe to keep serving/training from it). Peak device memory
    is float-total + int8-total + one layer's fp32 temp — fine up to ~2.7B
    on a 16 GB chip.

    free_source=True: mutates the input tree's attn/mlp dicts, freeing each
    float kernel the moment its int8 copy exists — device memory goes
    monotonically DOWN (peak float-total + one layer slab). This is how a
    12.2 GB bf16 GPT-J quantizes on a 16 GB chip (the copying default would
    need ~18 GB). The source tree is DESTROYED; only pass trees you own
    (e.g. freshly loaded, as the CLIs do).
    """
    out = params if free_source else dict(params)
    layers = out["layers"] if free_source else dict(params["layers"])
    for group, names in (("attn", _ATTN_KERNELS), ("mlp", _MLP_KERNELS)):
        sub = layers[group] if free_source else dict(layers[group])
        for k in names:
            if k not in sub or is_quantized(sub[k]):
                continue
            w = sub.pop(k) if free_source else sub[k]
            sub[k] = jax.block_until_ready(_quantize_stacked(w))
            del w                # free_source: float kernel freed before next
        layers[group] = sub
    if not free_source:
        out["layers"] = layers
    return out


def dequantize_weight(qw: dict) -> np.ndarray:
    """Reconstruct the float weight (for tests / error analysis)."""
    return np.asarray(qw["q"], np.float32) * np.asarray(qw["s"], np.float32)
