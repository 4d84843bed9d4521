"""Similarity scores (ref: sentence_transformers/util.py:24-66 cos_sim/dot_score).

fp32 accumulation via preferred_element_type so bf16 embeddings score stably.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _norm(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.clip(n, eps)).astype(x.dtype)


def dot_score(a: jax.Array, b: jax.Array) -> jax.Array:
    """(Na, D) x (Nb, D) -> (Na, Nb) inner products."""
    return jnp.einsum("ad,bd->ab", a, b, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


def cos_sim(a: jax.Array, b: jax.Array) -> jax.Array:
    """(Na, D) x (Nb, D) -> (Na, Nb) cosine similarities."""
    return dot_score(_norm(a), _norm(b))


def pairwise_cos_sim(a: jax.Array, b: jax.Array) -> jax.Array:
    """Row-wise cosine of equal-shaped (N, D) arrays -> (N,)."""
    return jnp.sum(_norm(a).astype(jnp.float32) * _norm(b).astype(jnp.float32), axis=-1)
