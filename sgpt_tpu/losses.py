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

from .ops.similarity import cos_sim, dot_score, pairwise_cos_sim


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


# ---------------------------------------------------------------------------
# The remaining ST-fork loss surface (sentence_transformers/losses/ — upstream
# losses the reference library exposes alongside MNRL; SURVEY.md §2b).
# All are pure functions over embedding arrays; pair them with any encoder.
# ---------------------------------------------------------------------------

def _euclidean(a, b):
    return jnp.sqrt(jnp.clip(jnp.sum(jnp.square(a - b), axis=-1), 1e-12))


def _cosine_distance(a, b):
    from .ops.similarity import _norm
    return 1.0 - jnp.sum(_norm(a) * _norm(b), axis=-1)


def softmax_loss(u: jax.Array, v: jax.Array, classifier_w: jax.Array,
                 labels: jax.Array, classifier_b: Optional[jax.Array] = None
                 ) -> jax.Array:
    """SoftmaxLoss (NLI classification head): logits = [u; v; |u-v|] @ W."""
    feats = jnp.concatenate([u, v, jnp.abs(u - v)], axis=-1)
    logits = feats @ classifier_w
    if classifier_b is not None:
        logits = logits + classifier_b
    return _cross_entropy(logits, labels)


def triplet_loss(anchors, positives, negatives, *, margin: float = 5.0,
                 distance: str = "euclidean") -> jax.Array:
    dist = _euclidean if distance == "euclidean" else _cosine_distance
    return jnp.mean(jnp.maximum(
        dist(anchors, positives) - dist(anchors, negatives) + margin, 0.0))


def contrastive_loss(u, v, labels, *, margin: float = 0.5,
                     distance: str = "cosine") -> jax.Array:
    """0.5 * (y * d^2 + (1-y) * relu(margin - d)^2)."""
    dist = _cosine_distance if distance == "cosine" else _euclidean
    d = dist(u, v)
    y = labels.astype(jnp.float32)
    return jnp.mean(0.5 * (y * jnp.square(d) +
                           (1 - y) * jnp.square(jnp.maximum(margin - d, 0.0))))


def online_contrastive_loss(u, v, labels, *, margin: float = 0.5,
                            distance: str = "cosine") -> jax.Array:
    """ContrastiveLoss over hard pairs only: positives farther than the closest
    negative, negatives closer than the farthest positive.

    Reference parity (OnlineContrastiveLoss.py:42-53): returns the
    UNNORMALIZED sum (dividing by the hard-pair count rescaled gradients by
    ~batch size vs the reference — review finding), and single-positive /
    single-negative batches fall back to mean-based thresholds exactly as
    the reference's `len(x) > 1` guards do."""
    dist = _cosine_distance if distance == "cosine" else _euclidean
    d = dist(u, v)
    y = labels.astype(bool)
    NEG_BIG = jnp.float32(1e9)
    n_pos = jnp.sum(y)
    n_neg = jnp.sum(~y)
    neg_min = jnp.min(jnp.where(~y, d, NEG_BIG))
    pos_max = jnp.max(jnp.where(y, d, -NEG_BIG))
    pos_mean = jnp.sum(jnp.where(y, d, 0.0)) / jnp.clip(n_pos, 1)
    neg_mean = jnp.sum(jnp.where(~y, d, 0.0)) / jnp.clip(n_neg, 1)
    pos_threshold = jnp.where(n_neg > 1, neg_min, pos_mean)
    neg_threshold = jnp.where(n_pos > 1, pos_max, neg_mean)
    hard_pos = jnp.logical_and(y, d > pos_threshold)
    hard_neg = jnp.logical_and(~y, d < neg_threshold)
    pos_term = jnp.where(hard_pos, jnp.square(d), 0.0)
    neg_term = jnp.where(hard_neg, jnp.square(jnp.maximum(margin - d, 0.0)), 0.0)
    return jnp.sum(pos_term) + jnp.sum(neg_term)


def margin_mse_loss(queries, positives, negatives, gold_margins) -> jax.Array:
    """MarginMSE (distillation): MSE between dot-score margins and teacher margins."""
    pred = (jnp.sum(queries * positives, axis=-1)
            - jnp.sum(queries * negatives, axis=-1))
    return jnp.mean(jnp.square(pred - gold_margins))


def mse_loss(student: jax.Array, teacher: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(student - teacher))


def cosine_similarity_loss(u, v, labels) -> jax.Array:
    """MSE between cosine similarity and gold score (STS regression training)."""
    from .ops.similarity import _norm
    pred = jnp.sum(_norm(u) * _norm(v), axis=-1)
    return jnp.mean(jnp.square(pred - labels.astype(jnp.float32)))


def mnrl_symmetric_loss(anchors: jax.Array, positives: jax.Array,
                        negatives: Optional[jax.Array] = None, *,
                        scale: float = 20.0,
                        similarity: str = "cos_sim") -> jax.Array:
    """MultipleNegativesSymmetricRankingLoss: the MNRL forward loss plus the
    reverse direction (given a positive, find its anchor among all anchors).
    Ref: losses/MultipleNegativesSymmetricRankingLoss.py:44-56 — the backward
    term uses only the anchor-positive score block (hard negatives contribute
    to the forward term only)."""
    sim = cos_sim if similarity == "cos_sim" else dot_score
    candidates = (positives if negatives is None
                  else jnp.concatenate([positives, negatives], axis=0))
    scores = sim(anchors, candidates) * scale
    labels = jnp.arange(anchors.shape[0])
    forward_loss = _cross_entropy(scores, labels)
    backward_loss = _cross_entropy(scores[:, : positives.shape[0]].T, labels)
    return (forward_loss + backward_loss) / 2


def contrastive_tension_loss(reps1: jax.Array, reps2: jax.Array,
                             labels: jax.Array) -> jax.Array:
    """ContrastiveTensionLoss: BCE-with-logits (SUM reduction, matching
    nn.BCEWithLogitsLoss(reduction='sum')) on raw dot products; label 1 marks
    the identical-sentence pair, 0 the sampled negatives. The two towers are
    independent encoders in the reference (model1 deep-copied, model2 kept for
    inference) — pass reps from two param sets.
    Ref: losses/ContrastiveTensionLoss.py:33-41."""
    logits = jnp.sum(reps1 * reps2, axis=-1).astype(jnp.float32)
    y = labels.astype(jnp.float32)
    # numerically-stable BCE-with-logits
    per = jnp.maximum(logits, 0.0) - logits * y + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(per)


def contrastive_tension_in_batch_negatives_loss(
        reps1: jax.Array, reps2: jax.Array, *, logit_scale: jax.Array
) -> jax.Array:
    """ContrastiveTensionLossInBatchNegatives: symmetric in-batch CE with a
    TRAINABLE temperature (logit_scale, init log(20) — exp() applied here).
    Ref: losses/ContrastiveTensionLoss.py:45-67."""
    scores = cos_sim(reps1, reps2) * jnp.exp(logit_scale)
    labels = jnp.arange(scores.shape[0])
    return (_cross_entropy(scores, labels) + _cross_entropy(scores.T, labels)) / 2


# ---------------------------------------------------------------------------
# Batch-triplet family (labels-driven triplet mining within a batch).
# Ref: losses/BatchHardTripletLoss.py, BatchAllTripletLoss.py,
# BatchSemiHardTripletLoss.py, BatchHardSoftMarginTripletLoss.py.
# ---------------------------------------------------------------------------

def pairwise_distances(embeddings: jax.Array, *, metric: str = "euclidean",
                       squared: bool = False) -> jax.Array:
    """(B, B) distance matrix. euclidean matches the reference's numerics:
    clamp negatives to 0 and guard sqrt(0) gradients by masking exact zeros
    (BatchHardTripletLoss.py:20-52); cosine = 1 - cos_sim."""
    if metric == "cosine":
        return 1.0 - cos_sim(embeddings, embeddings)
    dot = embeddings @ embeddings.T
    sq = jnp.diag(dot)
    d2 = jnp.maximum(sq[:, None] - 2.0 * dot + sq[None, :], 0.0)
    if squared:
        return d2
    zero = d2 == 0.0
    d = jnp.sqrt(d2 + jnp.where(zero, 1e-16, 0.0))
    return jnp.where(zero, 0.0, d)


def _positive_mask(labels):
    same = labels[:, None] == labels[None, :]
    return jnp.logical_and(same, ~jnp.eye(labels.shape[0], dtype=bool))


def _negative_mask(labels):
    return labels[:, None] != labels[None, :]


def _hardest_pos_neg(labels, embeddings, metric):
    d = pairwise_distances(embeddings, metric=metric)
    pos = _positive_mask(labels)
    neg = _negative_mask(labels)
    hardest_pos = jnp.max(jnp.where(pos, d, 0.0), axis=1)
    # invalid negatives get the row max added so min() skips them (:129-134)
    row_max = jnp.max(d, axis=1, keepdims=True)
    hardest_neg = jnp.min(jnp.where(neg, d, d + row_max), axis=1)
    return hardest_pos, hardest_neg


def batch_hard_triplet_loss(labels: jax.Array, embeddings: jax.Array, *,
                            margin: float = 5.0,
                            metric: str = "euclidean") -> jax.Array:
    """relu(hardest_positive - hardest_negative + margin), batch mean."""
    hp, hn = _hardest_pos_neg(labels, embeddings, metric)
    return jnp.mean(jnp.maximum(hp - hn + margin, 0.0))


def batch_hard_soft_margin_triplet_loss(labels: jax.Array,
                                        embeddings: jax.Array, *,
                                        metric: str = "euclidean") -> jax.Array:
    """Soft-margin variant: log1p(exp(hardest_pos - hardest_neg))
    (BatchHardSoftMarginTripletLoss.py:85)."""
    hp, hn = _hardest_pos_neg(labels, embeddings, metric)
    return jnp.mean(jnp.log1p(jnp.exp(hp - hn)))


def batch_all_triplet_loss(labels: jax.Array, embeddings: jax.Array, *,
                           margin: float = 5.0,
                           metric: str = "euclidean") -> jax.Array:
    """Mean over all VALID positive-loss triplets (a,p,n): a!=p, label(a)==
    label(p), label(a)!=label(n) (BatchAllTripletLoss.py:47-88)."""
    d = pairwise_distances(embeddings, metric=metric)
    tl = d[:, :, None] - d[:, None, :] + margin            # (a, p, n)
    B = labels.shape[0]
    same = labels[:, None] == labels[None, :]
    not_eye = ~jnp.eye(B, dtype=bool)
    valid = (jnp.logical_and(same, not_eye)[:, :, None]     # a,p same label, a!=p
             & (~same)[:, None, :])                         # a,n different label
    tl = jnp.where(valid, jnp.maximum(tl, 0.0), 0.0)
    num_positive = jnp.sum(tl > 1e-16)
    return jnp.sum(tl) / (num_positive + 1e-16)


def batch_semi_hard_triplet_loss(labels: jax.Array, embeddings: jax.Array, *,
                                 margin: float = 5.0,
                                 metric: str = "euclidean") -> jax.Array:
    """Semi-hard mining (BatchSemiHardTripletLoss.py:50-93, the TF recipe):
    for each (a, p) pick the closest negative FARTHER than d(a,p) if one
    exists, else the farthest negative; mean hinge over positive pairs."""
    d = pairwise_distances(embeddings, metric=metric)
    B = labels.shape[0]
    neg = _negative_mask(labels)                          # (a, n)
    # mask[a, p, n]: n is a valid negative for a AND d(a,n) > d(a,p)
    outside_mask = neg[:, None, :] & (d[:, None, :] > d[:, :, None])
    big = jnp.max(d)
    # closest negative beyond d(a,p); rows with none fall back to farthest neg
    negatives_outside = jnp.min(jnp.where(outside_mask, d[:, None, :], big + 1.0),
                                axis=2)
    has_outside = jnp.any(outside_mask, axis=2)
    # anchors with NO valid negative at all: the reference's _masked_maximum
    # returns the finite row minimum, not -inf (which would make the loss inf
    # and the gradients NaN on an all-same-label batch — review finding)
    has_neg = jnp.any(neg, axis=1)
    negatives_inside = jnp.where(
        has_neg, jnp.max(jnp.where(neg, d, -jnp.inf), axis=1),
        jnp.min(d, axis=1))                                   # (a,)
    semi_hard = jnp.where(has_outside, negatives_outside,
                          negatives_inside[:, None])
    loss_mat = d - semi_hard + margin
    pos = _positive_mask(labels)
    num_pos = jnp.sum(pos)
    return jnp.sum(jnp.where(pos, jnp.maximum(loss_mat, 0.0), 0.0)) / num_pos


def megabatch_margin_loss(anchors, positives, *, positive_margin: float = 0.8,
                          negative_margin: float = 0.3) -> jax.Array:
    """MegaBatchMarginLoss (ParaNMT): each anchor's hardest in-batch negative is
    the most-similar OTHER positive; loss = relu(pos_margin − cos(a, p))
    + relu(cos(a, hardest_neg) − neg_margin). Hardest-negative selection is
    non-differentiated (the reference picks it under no_grad)."""
    n = anchors.shape[0]
    scores = cos_sim(anchors, positives)                      # (n, n)
    neg_scores = scores - 2.0 * jnp.eye(n, dtype=scores.dtype)
    hard_ids = jax.lax.stop_gradient(jnp.argmax(neg_scores, axis=1))
    hard_negs = positives[hard_ids]
    pos_cos = pairwise_cos_sim(anchors, positives)
    neg_cos = pairwise_cos_sim(anchors, hard_negs)
    return jnp.mean(jnp.maximum(positive_margin - pos_cos, 0.0)
                    + jnp.maximum(neg_cos - negative_margin, 0.0))
