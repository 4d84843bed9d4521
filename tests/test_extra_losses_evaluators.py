"""Upstream-surface losses and evaluators."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.losses import (softmax_loss, triplet_loss, contrastive_loss,
                             online_contrastive_loss, margin_mse_loss, mse_loss,
                             cosine_similarity_loss)
from sgpt_tpu.evaluation.extra import (TripletEvaluator,
                                       BinaryClassificationEvaluator,
                                       RerankingEvaluator, MSEEvaluator,
                                       TranslationEvaluator, SequentialEvaluator)

rng = np.random.default_rng(0)
U = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
V = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)


def test_softmax_loss_shapes_and_perfect():
    w = jnp.zeros((18, 3), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 0, 1, 2, 0, 1])
    loss = softmax_loss(U, V, w, labels)
    np.testing.assert_allclose(float(loss), np.log(3), rtol=1e-5)  # uniform


def test_triplet_loss_zero_when_separated():
    a = jnp.zeros((4, 3))
    p = jnp.zeros((4, 3))          # d(a,p)=0
    n = jnp.ones((4, 3)) * 100     # d(a,n)=large
    assert float(triplet_loss(a, p, n, margin=5.0)) == 0.0
    assert float(triplet_loss(a, n, p, margin=5.0)) > 0.0


def test_contrastive_loss_directions():
    y1 = jnp.ones((8,))
    y0 = jnp.zeros((8,))
    same = contrastive_loss(U, U, y1)      # identical positives → 0
    assert float(same) < 1e-6
    diff = contrastive_loss(U, V, y1)
    assert float(diff) > float(same)
    # negatives at distance 0 are maximally penalized
    neg_close = contrastive_loss(U, U, y0)
    assert float(neg_close) > 0


def test_online_contrastive_selects_hard_pairs():
    y = jnp.asarray([1, 1, 0, 0])
    u = jnp.asarray(rng.normal(size=(4, 5)), jnp.float32)
    loss = online_contrastive_loss(u, u * 1.0, y)
    assert np.isfinite(float(loss))


def test_margin_mse_and_mse():
    q = jnp.asarray(rng.normal(size=(4, 5)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(4, 5)), jnp.float32)
    n = jnp.asarray(rng.normal(size=(4, 5)), jnp.float32)
    gold = jnp.sum(q * p, -1) - jnp.sum(q * n, -1)
    assert float(margin_mse_loss(q, p, n, gold)) < 1e-10
    assert float(mse_loss(q, q)) == 0.0


def test_cosine_similarity_loss():
    labels = jnp.ones((8,))
    assert float(cosine_similarity_loss(U, U, labels)) < 1e-10


def test_megabatch_margin_loss():
    from sgpt_tpu.losses import megabatch_margin_loss
    # well-separated pairs: cos(a_i, p_i)=1, cos(a_i, p_j)=0 → zero loss
    eye = jnp.eye(6, 8, dtype=jnp.float32)
    loss = megabatch_margin_loss(eye, eye, positive_margin=0.8,
                                 negative_margin=0.3)
    assert float(loss) == 0.0
    # identical positives: hardest negative == positive → neg term fires
    same = jnp.ones((4, 8), jnp.float32)
    loss2 = megabatch_margin_loss(same, same)
    assert float(loss2) > 0.5


# ---------------------------------------------------------------------------

VOCAB = {}


def toy_encode(texts):
    out = np.zeros((len(texts), 8), np.float32)
    for i, t in enumerate(texts):
        idx = VOCAB.setdefault(t, len(VOCAB) % 8)
        out[i, idx] = 1.0
        out[i, 7] += 0.05
    return out


def test_triplet_evaluator():
    ev = TripletEvaluator(["a", "b"], ["a", "b"], ["x", "y"])
    assert ev(toy_encode) == 1.0


def test_binary_classification_evaluator():
    s1 = ["p1", "p2", "n1", "n2"]
    s2 = ["p1", "p2", "q1", "q2"]   # first two identical pairs
    labels = [1, 1, 0, 0]
    res = BinaryClassificationEvaluator(s1, s2, labels).compute(toy_encode)
    assert res["ap"] == 1.0 and res["accuracy"] == 1.0 and res["f1"] == 1.0


def test_reranking_evaluator():
    samples = [{"query": "q", "positive": ["q"], "negative": ["z1", "z2"]}]
    res = RerankingEvaluator(samples).compute(toy_encode)
    assert res["mrr"] == 1.0 and res["map"] == 1.0


def test_mse_translation_sequential():
    sents = ["s1", "s2"]
    teacher = toy_encode(sents)
    assert MSEEvaluator(sents, teacher)(toy_encode) == 0.0

    ev = TranslationEvaluator(["a", "b"], ["a", "b"])
    assert ev(toy_encode) == 1.0

    seq = SequentialEvaluator([lambda f: 0.5, lambda f: 0.9])
    assert seq(toy_encode) == 0.9


# ---------------------------------------------------------------------------
# round-5 evaluation tail: LabelAccuracyEvaluator, MSEEvaluatorFromDataFrame
# ---------------------------------------------------------------------------

def test_label_accuracy_evaluator_golden():
    from sgpt_tpu.evaluation.extra import LabelAccuracyEvaluator
    ev = LabelAccuracyEvaluator(["a", "b", "c"], ["x", "y", "z"], [0, 1, 1])

    def classify(s1, s2):
        return np.array([[2.0, 0.0],    # 0 == 0
                         [0.0, 2.0],    # 1 == 1
                         [2.0, 0.0]])   # 0 != 1
    assert ev(classify) == pytest.approx(2 / 3)


def test_label_accuracy_softmax_head_matches_loss_features():
    """softmax_head_classifier must build the same [u; v; |u-v|] features as
    losses.softmax_loss, so an evaluator over a trained head is consistent."""
    from sgpt_tpu.evaluation.extra import LabelAccuracyEvaluator
    rng = np.random.default_rng(0)
    D, C = 6, 3
    emb = {"a": rng.normal(size=D), "b": rng.normal(size=D),
           "x": rng.normal(size=D), "y": rng.normal(size=D)}
    W = rng.normal(size=(3 * D, C))
    b = rng.normal(size=C)

    def encode(texts):
        return np.stack([emb[t] for t in texts])

    classify = LabelAccuracyEvaluator.softmax_head_classifier(encode, W, b)
    logits = classify(["a", "b"], ["x", "y"])
    u, v = encode(["a", "b"]), encode(["x", "y"])
    feats = np.concatenate([u, v, np.abs(u - v)], axis=-1)
    np.testing.assert_allclose(logits, feats @ W + b, rtol=1e-12)
    # and it agrees with the jax loss's logits argmax
    scores = jnp.concatenate([jnp.asarray(u), jnp.asarray(v),
                              jnp.abs(jnp.asarray(u - v))], axis=-1) @ W + b
    labels = np.argmax(np.asarray(scores), axis=1)
    ev = LabelAccuracyEvaluator(["a", "b"], ["x", "y"], labels)
    assert ev(classify) == pytest.approx(1.0)


def test_mse_evaluator_from_dataframe_golden():
    from sgpt_tpu.evaluation.extra import MSEEvaluatorFromDataFrame
    rows = [{"en": "one", "de": "eins"},
            {"en": "two", "de": "zwei"},
            {"en": "   ", "de": "leer"}]   # skipped: empty source
    vecs = {"one": np.array([1.0, 0.0]), "two": np.array([0.0, 1.0]),
            "eins": np.array([1.0, 0.2]), "zwei": np.array([0.0, 1.0])}
    teacher_calls = []

    def teacher(texts):
        teacher_calls.append(list(texts))
        return np.stack([vecs[t] for t in texts])

    def student(texts):
        return np.stack([vecs[t] for t in texts])

    ev = MSEEvaluatorFromDataFrame(rows, teacher, [("en", "de")])
    # teacher ran once, on the deduped non-empty sources
    assert teacher_calls == [["one", "two"]]
    # row1 mse = mean((1-1)^2,(0-.2)^2)=.02 ; row2 = 0 ; mean=.01 ; x100=1.0
    assert ev.compute(student)["en-de"] == pytest.approx(1.0)
    assert ev(student) == pytest.approx(-1.0)  # negated, higher-is-better
