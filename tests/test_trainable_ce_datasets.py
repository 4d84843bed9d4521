"""Trainable cross-encoder + remaining dataset/reader/pooling surface."""
import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.cross_encoder_trainable import (CrossEncoderTrainable,
                                              CECorrelationEvaluator,
                                              CEBinaryClassificationEvaluator)
from sgpt_tpu.data import InputExample
from sgpt_tpu.data.datasets import (SentenceLabelBatcher, ParallelSentencesData,
                                    denoise_text)
from sgpt_tpu.data.readers import STSDataReader, NLIDataReader, TripletReader
from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.ops.pooling import weighted_layer_pool, mean_pool
from sgpt_tpu.tokenization import SimpleTokenizer

VOCAB = 512


@pytest.fixture(scope="module")
def ce():
    cfg = tiny("neo", num_layers=2, hidden_size=32, num_heads=2, vocab_size=VOCAB)
    params = init_params(cfg, jax.random.key(0))
    return CrossEncoderTrainable(params, cfg, SimpleTokenizer(vocab_size=VOCAB),
                                 batch_size=4, max_length=32)


def test_ce_predict_shapes(ce):
    pairs = [("query one", "doc one"), ("query two", "doc two")]
    scores = ce.predict(pairs)
    assert scores.shape == (2,)
    assert ((scores >= 0) & (scores <= 1)).all()  # sigmoid


def test_ce_training_reduces_loss(ce):
    # learnable toy task: pairs sharing a token are positive
    rng = np.random.default_rng(0)
    samples = []
    for i in range(32):
        w = f"tok{i % 6}"
        samples.append(InputExample(texts=(f"{w} left", f"{w} right"), label=1.0))
        samples.append(InputExample(texts=(f"{w} left", f"other{i} right"), label=0.0))
    hist = ce.fit(samples, epochs=3, lr=1e-3)
    losses = [h["loss"] for h in hist if "loss" in h]
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_ce_evaluators(ce):
    pairs = [("a", "a"), ("b", "c")]
    corr = CECorrelationEvaluator(pairs, [1.0, 0.0])
    assert -1.0 <= corr(ce) <= 1.0
    binary = CEBinaryClassificationEvaluator(pairs, [1, 0])
    assert 0.0 <= binary(ce) <= 1.0


def test_sentence_label_batcher():
    examples = [InputExample(texts=(f"s{i}",), label=i % 5) for i in range(40)]
    batcher = SentenceLabelBatcher(examples, batch_size=8, samples_per_label=2)
    for batch in batcher:
        labels = [ex.label for ex in batch]
        for l in set(labels):
            assert labels.count(l) == 2


def test_parallel_sentences_data():
    teacher_calls = []

    def teacher(texts):
        teacher_calls.append(texts)
        return np.ones((len(texts), 4), np.float32)

    ds = ParallelSentencesData(teacher, batch_size=2)
    ds.add_dataset([["en one", "de eins"], ["en two", "de zwei"],
                    ["en three", "de drei"]])
    batches = list(ds.batches())
    assert len(batches) == 1
    texts, emb = batches[0]
    assert texts == ["de eins", "de zwei"]
    assert emb.shape == (2, 4)
    assert teacher_calls[0] == ["en one", "en two"]


def test_denoise_text():
    rng = random.Random(0)
    out = denoise_text("a b c d e f g h", del_ratio=0.5, rng=rng)
    assert 1 <= len(out.split()) <= 8
    assert all(w in "a b c d e f g h".split() for w in out.split())
    assert denoise_text("", 0.5) == ""


def test_readers(tmp_path):
    with open(tmp_path / "sts.tsv", "w") as f:
        f.write("split\tsentence1\tsentence2\tscore\n")
        f.write("train\ts one\ts two\t2.5\n")
        f.write("dev\ts three\ts four\t5.0\n")
    sts = STSDataReader(str(tmp_path))
    ex = sts.get_examples("sts.tsv")
    assert len(ex) == 2 and ex[0].label == 0.5
    assert len(sts.get_examples("sts.tsv", split="dev")) == 1

    with open(tmp_path / "nli.tsv", "w") as f:
        f.write("sentence1\tsentence2\tlabel\n")
        f.write("p\th\tentailment\n")
        f.write("p\th2\tbogus\n")
    nli = NLIDataReader(str(tmp_path)).get_examples("nli.tsv")
    assert len(nli) == 1 and nli[0].label == 1

    with open(tmp_path / "trip.tsv", "w") as f:
        f.write("a\tp\tn\n")
    trip = TripletReader(str(tmp_path)).get_examples("trip.tsv")
    assert trip[0].texts == ("a", "p", "n")


def test_weighted_layer_pool():
    rng = np.random.default_rng(0)
    stack = jnp.asarray(rng.normal(size=(3, 2, 5, 4)), jnp.float32)
    mask = jnp.ones((2, 5), jnp.int32)
    # all weight on layer 2 == mean-pool of that layer
    w = jnp.asarray([0.0, 0.0, 1.0])
    got = weighted_layer_pool(stack, mask, w)
    want = mean_pool(stack[2], mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_ce_pair_truncation_longest_first(ce):
    """ST-parity longest_first: both pair members survive truncation.

    Right-truncation made scores passage-independent when s1 filled the
    window; left-truncation made them query-independent (advisor finding)."""
    tok = ce.tokenizer
    long_q = " ".join(f"qw{i}" for i in range(64))   # 64 > max_length=32
    long_d = " ".join(f"dw{i}" for i in range(64))
    short_q = "short query"
    budget = ce.max_length - 1

    # both long: meet at ceil/floor of the budget
    ids, mask = ce._tokenize_pairs([(long_q, long_d)])
    row = np.asarray(ids[0])[np.asarray(mask[0]) == 1]
    sep = np.where(row == tok.eos_id)[0]
    assert len(row) == ce.max_length
    a, b = sep[0], len(row) - sep[0] - 1
    assert abs(int(a) - int(b)) <= 1 and a > 0 and b > 0

    # short s1 + long s2: s1 survives whole, s2 gets the rest
    ids, mask = ce._tokenize_pairs([(short_q, long_d)])
    row = np.asarray(ids[0])[np.asarray(mask[0]) == 1]
    sep = np.where(row == tok.eos_id)[0]
    nq = len(tok.encode(short_q))
    assert sep[0] == nq and len(row) - nq - 1 == budget - nq

    # long s1 + short s2: the mirror case the right-truncation bug broke
    ids, mask = ce._tokenize_pairs([(long_q, "tiny doc")])
    row = np.asarray(ids[0])[np.asarray(mask[0]) == 1]
    sep = np.where(row == tok.eos_id)[0]
    nd = len(tok.encode("tiny doc"))
    assert len(row) - sep[0] - 1 == nd  # doc fully present


def test_ce_pair_scores_depend_on_both_sides(ce):
    long_q = " ".join(f"qw{i}" for i in range(64))
    s_a = ce.predict([(long_q, "doc about apples")])
    s_b = ce.predict([(long_q, "doc about oranges")])
    assert s_a[0] != s_b[0]  # passage reaches the model even at full-window s1


# ---------------------------------------------------------------------------
# round-5 CE evaluator tail (reference cross_encoder/evaluation/*.py)
# ---------------------------------------------------------------------------

class _StubCE:
    """predict() returns canned scores — golden-value tests for evaluator math."""

    def __init__(self, scores):
        self.scores = np.asarray(scores)

    def predict(self, pairs, **kw):
        assert len(pairs) == len(self.scores)
        return self.scores


def test_ce_binary_accuracy_fixed_threshold():
    from sgpt_tpu.cross_encoder_trainable import CEBinaryAccuracyEvaluator
    pairs = [("q", "d")] * 4
    ev = CEBinaryAccuracyEvaluator(pairs, labels=[1, 0, 1, 0])
    # scores .9,.2,.4,.6 at threshold .5 -> preds 1,0,0,1 -> acc 0.5
    assert ev(_StubCE([0.9, 0.2, 0.4, 0.6])) == pytest.approx(0.5)
    ev2 = CEBinaryAccuracyEvaluator(pairs, labels=[1, 0, 1, 0], threshold=0.3)
    # preds 1,0,1,1 -> acc 0.75
    assert ev2(_StubCE([0.9, 0.2, 0.4, 0.6])) == pytest.approx(0.75)


def test_ce_softmax_accuracy():
    from sgpt_tpu.cross_encoder_trainable import CESoftmaxAccuracyEvaluator
    pairs = [("a", "b")] * 3
    ev = CESoftmaxAccuracyEvaluator(pairs, labels=[0, 2, 1])
    logits = np.array([[2.0, 1.0, 0.0],    # argmax 0 == label 0
                       [0.0, 1.0, 2.0],    # argmax 2 == label 2
                       [3.0, 1.0, 2.0]])   # argmax 0 != label 1
    assert ev(_StubCE(logits)) == pytest.approx(2 / 3)
    with pytest.raises(ValueError):
        ev(_StubCE(np.zeros(3)))  # 1-output model is a usage error


def test_ce_reranking_evaluator_golden():
    from sgpt_tpu.cross_encoder_trainable import CERerankingEvaluator
    samples = [
        # positive ranked 2nd -> MRR 1/2
        {"query": "q1", "positive": ["p"], "negative": ["n1", "n2"]},
        # positive ranked 1st -> MRR 1
        {"query": "q2", "positive": ["p"], "negative": ["n"]},
        # skipped: no negatives (reference behavior)
        {"query": "q3", "positive": ["p"], "negative": []},
    ]
    ev = CERerankingEvaluator(samples, mrr_at_k=10)
    assert len(ev.samples) == 2  # the empty-negative sample dropped
    # q1 docs [p, n1, n2] scores .5,.9,.1 -> order n1,p,n2; q2 [p, n] .8,.2
    assert ev(_StubCE([0.5, 0.9, 0.1, 0.8, 0.2])) == pytest.approx((0.5 + 1.0) / 2)


def test_ce_reranking_mrr_cutoff_and_dict_input():
    from sgpt_tpu.cross_encoder_trainable import CERerankingEvaluator
    # positive ranked 3rd but mrr_at_k=2 -> MRR 0
    samples = {"q": {"query": "q", "positive": ["p"],
                     "negative": ["n1", "n2"]}}
    ev = CERerankingEvaluator(samples, mrr_at_k=2)
    assert ev(_StubCE([0.1, 0.9, 0.5])) == pytest.approx(0.0)


def test_ce_reranking_with_real_model(ce):
    from sgpt_tpu.cross_encoder_trainable import CERerankingEvaluator
    samples = [{"query": "alpha beta", "positive": ["alpha beta"],
                "negative": ["gamma delta", "zzz yyy"]}]
    score = CERerankingEvaluator(samples)(ce)
    assert 0.0 <= score <= 1.0


def test_ce_softmax_accuracy_with_real_multilabel_model():
    from sgpt_tpu.cross_encoder_trainable import CESoftmaxAccuracyEvaluator
    from sgpt_tpu.models import tiny, init_params
    cfg = tiny("neo", num_layers=2, hidden_size=32, num_heads=2, vocab_size=VOCAB)
    params = init_params(cfg, jax.random.key(1))
    model = CrossEncoderTrainable(params, cfg, SimpleTokenizer(vocab_size=VOCAB),
                                  num_labels=3, batch_size=4, max_length=32)
    ev = CESoftmaxAccuracyEvaluator([("a", "b"), ("c", "d")], [0, 1])
    assert 0.0 <= ev(model) <= 1.0
