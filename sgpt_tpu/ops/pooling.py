"""Pooling: hidden states (B, T, D) + attention mask (B, T) → sentence embedding (B, D).

Implements every pooling method the SGPT reference exposes
(ref: biencoder/beir/beir_dense_retriever.py:237-304 and
biencoder/nli_msmarco/sentence-transformers/sentence_transformers/models/Pooling.py:90-164,
models/WeightedMeanPooling.py:21-38):

  mean          masked token mean
  weightedmean  position-weighted mean, weight_t = t+1 (SGPT's headline method)
  lasttoken     hidden state at the last unpadded position
  meanmean      mean over all layers and tokens       (takes stacked (L,B,T,D))
  lasttokenmean last-token state averaged over layers (takes stacked (L,B,T,D))
  learned_weightedmean  per-position weights are a trained parameter

All functions are pure jnp (fuse into the encoder under jit — unlike the
reference, which ships hidden states to host and pools on CPU,
beir_dense_retriever.py:221). Accumulation is fp32 regardless of input dtype.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _masked(hidden: jax.Array, mask: jax.Array):
    m = mask.astype(jnp.float32)[..., None]           # (B, T, 1)
    return hidden.astype(jnp.float32) * m, m


def mean_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    h, m = _masked(hidden, mask)
    return (jnp.sum(h, axis=1) / jnp.clip(jnp.sum(m, axis=1), 1e-9)).astype(hidden.dtype)


def weighted_mean_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """Position-weighted mean: weight of position t (0-based) is t+1.

    Weights follow the *padded* position index exactly as the reference does
    (arange over seq_len, masked afterwards) — with right-padding the two agree.
    """
    T = hidden.shape[1]
    w = jnp.arange(1, T + 1, dtype=jnp.float32)[None, :, None]
    h, m = _masked(hidden, mask)
    mw = m * w
    return (jnp.sum(h * w, axis=1) / jnp.clip(jnp.sum(mw, axis=1), 1e-9)).astype(hidden.dtype)


def learned_weighted_mean_pool(hidden: jax.Array, mask: jax.Array,
                               position_weights: jax.Array) -> jax.Array:
    """Learnt per-position weights (ref: models/WeightedMeanPooling.py:21-38)."""
    T = hidden.shape[1]
    w = position_weights[:T].astype(jnp.float32)[None, :, None]
    h, m = _masked(hidden, mask)
    mw = m * w
    return (jnp.sum(h * w, axis=1) / jnp.clip(jnp.sum(mw, axis=1), 1e-9)).astype(hidden.dtype)


def last_token_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """State at the last unpadded position (index = sum(mask) - 1).

    The BEIR driver computes this index from the pre-padding length
    (beir_dense_retriever.py:198), equivalent to sum(mask)-1 under right padding.
    (The ST fork's argmin(mask)-1 variant breaks on full-length rows; we use the
    correct form everywhere.)
    """
    idx = jnp.clip(jnp.sum(mask, axis=1).astype(jnp.int32) - 1, 0)
    return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]


def mean_mean_pool(all_hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over layers AND tokens of stacked hidden states (L, B, T, D)."""
    L = all_hidden.shape[0]
    m = mask.astype(jnp.float32)[None, :, :, None]
    s = jnp.sum(all_hidden.astype(jnp.float32) * m, axis=(0, 2))
    denom = jnp.clip(L * jnp.sum(mask.astype(jnp.float32), axis=1)[:, None], 1e-9)
    return (s / denom).astype(all_hidden.dtype)


def last_token_mean_pool(all_hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """Last-token state averaged over all layers (stacked (L, B, T, D) input)."""
    idx = jnp.clip(jnp.sum(mask, axis=1).astype(jnp.int32) - 1, 0)
    g = jnp.take_along_axis(all_hidden, idx[None, :, None, None], axis=2)[:, :, 0]
    return jnp.mean(g.astype(jnp.float32), axis=0).astype(all_hidden.dtype)


def token_weighted_mean_pool(hidden: jax.Array, mask: jax.Array,
                             token_weights: jax.Array) -> jax.Array:
    """Mean pool with per-TOKEN weights (ST models/WordWeights: e.g. idf values
    looked up per input id — pass token_weights = weight_table[input_ids],
    shape (B, T)). The reference's Pooling consumes this as
    'token_weights_sum' (Pooling.py:116-119)."""
    w = token_weights.astype(jnp.float32)[..., None]
    h, m = _masked(hidden, mask)
    mw = m * w
    return (jnp.sum(h * w * m, axis=1)
            / jnp.clip(jnp.sum(mw, axis=1), 1e-9)).astype(hidden.dtype)


def weighted_layer_pool(all_hidden: jax.Array, mask: jax.Array,
                        layer_weights: jax.Array,
                        layer_start: int = 0) -> jax.Array:
    """Learnt softmax-free weighted average over LAYERS, then masked token mean
    (ST models/WeightedLayerPooling: per-layer scalar weights over the hidden-
    state stack). all_hidden: (L, B, T, D); layer_weights: (L - layer_start,)."""
    stack = all_hidden[layer_start:].astype(jnp.float32)
    w = layer_weights.astype(jnp.float32)
    w = w / jnp.clip(jnp.sum(w), 1e-9)
    mixed = jnp.einsum("l,lbtd->btd", w, stack)
    return mean_pool(mixed, mask).astype(all_hidden.dtype)


def max_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked max over tokens (ST Pooling 'max' mode)."""
    neg = jnp.asarray(-1e9, hidden.dtype)
    masked = jnp.where(mask[..., None].astype(bool), hidden, neg)
    return jnp.max(masked, axis=1)


def cls_pool(hidden: jax.Array, mask: jax.Array) -> jax.Array:
    """First-token state (ST Pooling 'cls' mode)."""
    del mask
    return hidden[:, 0]


def normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.clip(n, eps)).astype(x.dtype)


# Methods over the final (or layeridx-selected) hidden state.
POOLERS = {
    "mean": mean_pool,
    "weightedmean": weighted_mean_pool,
    "lasttoken": last_token_pool,
    "max": max_pool,
    "cls": cls_pool,
}

# Methods over the full hidden-state stack (L+1, B, T, D).
STACK_POOLERS = {
    "meanmean": mean_mean_pool,
    "lasttokenmean": last_token_mean_pool,
}


def pool(method: str, hidden_or_stack: jax.Array, mask: jax.Array, **kw) -> jax.Array:
    if method in POOLERS:
        return POOLERS[method](hidden_or_stack, mask, **kw)
    if method in STACK_POOLERS:
        return STACK_POOLERS[method](hidden_or_stack, mask, **kw)
    if method == "learned_weightedmean":
        return learned_weighted_mean_pool(hidden_or_stack, mask, **kw)
    raise ValueError(f"unknown pooling method {method!r}")
