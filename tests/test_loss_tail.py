"""Golden-value tests for the round-2 loss surface additions.

Each expected value is computed by an INDEPENDENT numpy brute-force
implementation following the reference formulas (sentence_transformers/losses/
MultipleNegativesSymmetricRankingLoss.py, ContrastiveTensionLoss.py,
BatchAll/BatchHard/BatchSemiHard/BatchHardSoftMargin TripletLoss.py).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from sgpt_tpu.losses import (batch_all_triplet_loss,
                             batch_hard_soft_margin_triplet_loss,
                             batch_hard_triplet_loss,
                             batch_semi_hard_triplet_loss,
                             contrastive_tension_in_batch_negatives_loss,
                             contrastive_tension_loss, mnrl_loss,
                             mnrl_symmetric_loss, pairwise_distances)

RNG = np.random.default_rng(0)


def _np_log_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def _np_ce(scores, labels):
    lp = _np_log_softmax(scores)
    return -np.mean(lp[np.arange(len(labels)), labels])


def _np_cos(a, b):
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    return an @ bn.T


def _np_euclid(e):
    d2 = np.maximum(
        (e * e).sum(1)[:, None] - 2 * e @ e.T + (e * e).sum(1)[None, :], 0.0)
    d = np.sqrt(np.where(d2 == 0, 0, d2))
    return d


def test_mnrl_symmetric_golden():
    a = RNG.normal(size=(4, 8)).astype(np.float32)
    p = RNG.normal(size=(4, 8)).astype(np.float32)
    n = RNG.normal(size=(4, 8)).astype(np.float32)
    scores = _np_cos(a, np.concatenate([p, n])) * 20.0
    labels = np.arange(4)
    want = (_np_ce(scores, labels) + _np_ce(scores[:, :4].T, labels)) / 2
    got = float(mnrl_symmetric_loss(jnp.asarray(a), jnp.asarray(p),
                                    jnp.asarray(n)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # without negatives, symmetric >= forward-only is not guaranteed, but both
    # must agree on the forward term at matched scale
    got2 = float(mnrl_symmetric_loss(jnp.asarray(a), jnp.asarray(p)))
    scores2 = _np_cos(a, p) * 20.0
    want2 = (_np_ce(scores2, labels) + _np_ce(scores2.T, labels)) / 2
    np.testing.assert_allclose(got2, want2, rtol=1e-5)


def test_contrastive_tension_golden():
    r1 = RNG.normal(size=(6, 8)).astype(np.float32)
    r2 = RNG.normal(size=(6, 8)).astype(np.float32)
    y = np.array([1, 0, 0, 1, 0, 0], np.float32)
    logits = (r1 * r2).sum(1)
    # BCEWithLogits, SUM reduction
    want = np.sum(np.maximum(logits, 0) - logits * y
                  + np.log1p(np.exp(-np.abs(logits))))
    got = float(contrastive_tension_loss(jnp.asarray(r1), jnp.asarray(r2),
                                         jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_contrastive_tension_in_batch_golden():
    r1 = RNG.normal(size=(5, 8)).astype(np.float32)
    r2 = RNG.normal(size=(5, 8)).astype(np.float32)
    log_scale = np.float32(np.log(20.0))
    scores = _np_cos(r1, r2) * np.exp(log_scale)
    labels = np.arange(5)
    want = (_np_ce(scores, labels) + _np_ce(scores.T, labels)) / 2
    got = float(contrastive_tension_in_batch_negatives_loss(
        jnp.asarray(r1), jnp.asarray(r2), logit_scale=jnp.asarray(log_scale)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


LABELS = np.array([0, 0, 1, 1, 2, 2])
EMB = RNG.normal(size=(6, 4)).astype(np.float32)


def test_pairwise_distances_golden():
    got = np.asarray(pairwise_distances(jnp.asarray(EMB)))
    np.testing.assert_allclose(got, _np_euclid(EMB), atol=1e-5)
    got_cos = np.asarray(pairwise_distances(jnp.asarray(EMB), metric="cosine"))
    np.testing.assert_allclose(got_cos, 1 - _np_cos(EMB, EMB), atol=1e-5)


def _np_hardest(labels, emb):
    d = _np_euclid(emb)
    B = len(labels)
    hp = np.zeros(B)
    hn = np.zeros(B)
    for a in range(B):
        pos = [p for p in range(B) if p != a and labels[p] == labels[a]]
        neg = [n for n in range(B) if labels[n] != labels[a]]
        hp[a] = max(d[a, p] for p in pos)
        hn[a] = min(d[a, n] for n in neg)
    return hp, hn


def test_batch_hard_golden():
    hp, hn = _np_hardest(LABELS, EMB)
    want = np.mean(np.maximum(hp - hn + 5.0, 0.0))
    got = float(batch_hard_triplet_loss(jnp.asarray(LABELS), jnp.asarray(EMB)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_batch_hard_soft_margin_golden():
    hp, hn = _np_hardest(LABELS, EMB)
    want = np.mean(np.log1p(np.exp(hp - hn)))
    got = float(batch_hard_soft_margin_triplet_loss(jnp.asarray(LABELS),
                                                    jnp.asarray(EMB)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_batch_all_golden():
    d = _np_euclid(EMB)
    B = len(LABELS)
    losses = []
    for a in range(B):
        for p in range(B):
            for n in range(B):
                if a == p or LABELS[a] != LABELS[p] or LABELS[a] == LABELS[n]:
                    continue
                losses.append(max(d[a, p] - d[a, n] + 5.0, 0.0))
    losses = np.array(losses)
    num_pos = (losses > 1e-16).sum()
    want = losses.sum() / (num_pos + 1e-16)
    got = float(batch_all_triplet_loss(jnp.asarray(LABELS), jnp.asarray(EMB)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_batch_semi_hard_golden():
    d = _np_euclid(EMB)
    B = len(LABELS)
    total, count = 0.0, 0
    for a in range(B):
        negs = [n for n in range(B) if LABELS[n] != LABELS[a]]
        for p in range(B):
            if p == a or LABELS[p] != LABELS[a]:
                continue
            outside = [d[a, n] for n in negs if d[a, n] > d[a, p]]
            semi = min(outside) if outside else max(d[a, n] for n in negs)
            total += max(d[a, p] - semi + 5.0, 0.0)
            count += 1
    want = total / count
    got = float(batch_semi_hard_triplet_loss(jnp.asarray(LABELS),
                                             jnp.asarray(EMB)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_contrastive_tension_batches():
    from sgpt_tpu.data import contrastive_tension_batches
    sents = [f"sentence {i}" for i in range(40)]
    batches = list(contrastive_tension_batches(sents, batch_size=8,
                                               pos_neg_ratio=4))
    assert batches
    for batch in batches:
        assert len(batch) == 8
        for i, ex in enumerate(batch):
            if i % 4 == 0:
                assert ex.label == 1.0 and ex.texts[0] == ex.texts[1]
            else:
                assert ex.label == 0.0 and ex.texts[0] != ex.texts[1]
    with pytest.raises(ValueError):
        list(contrastive_tension_batches(sents, batch_size=6, pos_neg_ratio=4))
