"""Contrastive losses.

MultipleNegativesRankingLoss with in-batch (and cross-device) negatives —
the SGPT training loss (ref: sentence_transformers/losses/
MultipleNegativesRankingLoss.py:9-83: cos-sim × scale 20, cross-entropy over
in-batch candidates; distributed branch all-gathers positives+hard-negatives
and offsets labels by rank).

TPU-native mapping (SURVEY.md §2c): under single-controller pjit the "global
batch" is already global, so `mnrl_loss` on the full batch IS the distributed
loss. `mnrl_loss_dp` is the explicit shard_map form — per-shard anchors score
against an `all_gather`ed candidate set with rank-offset labels, riding ICI —
for when the scores matrix must not materialize globally. Both are exactly
equal in value and gradient (AD through collectives is native in JAX).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from .ops.similarity import cos_sim, dot_score


def _cross_entropy(scores: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def mnrl_loss(anchors: jax.Array, positives: jax.Array,
              negatives: Optional[jax.Array] = None, *,
              scale: float = 20.0, similarity: str = "cos_sim") -> jax.Array:
    """Anchor i must match candidate i among [positives; hard negatives]."""
    sim = cos_sim if similarity == "cos_sim" else dot_score
    candidates = (positives if negatives is None
                  else jnp.concatenate([positives, negatives], axis=0))
    scores = sim(anchors, candidates) * scale
    labels = jnp.arange(anchors.shape[0])
    return _cross_entropy(scores, labels)


def mnrl_loss_dp(anchors: jax.Array, positives: jax.Array,
                 negatives: Optional[jax.Array] = None, *,
                 axis_name: str = "dp", scale: float = 20.0,
                 similarity: str = "cos_sim") -> jax.Array:
    """Per-shard MNRL under shard_map/pmap over `axis_name`.

    Inputs are the LOCAL shard (n_local, D). Candidates are all-gathered across
    the axis; labels offset by rank*n_local (MultipleNegativesRankingLoss.py:70-73).
    Returns the cross-axis mean loss.
    """
    sim = cos_sim if similarity == "cos_sim" else dot_score
    n_local = anchors.shape[0]
    rank = jax.lax.axis_index(axis_name)

    full_pos = jax.lax.all_gather(positives, axis_name, tiled=True)
    if negatives is not None:
        full_neg = jax.lax.all_gather(negatives, axis_name, tiled=True)
        candidates = jnp.concatenate([full_pos, full_neg], axis=0)
    else:
        candidates = full_pos

    scores = sim(anchors, candidates) * scale
    labels = jnp.arange(n_local) + n_local * rank
    return jax.lax.pmean(_cross_entropy(scores, labels), axis_name)
