"""Data pipelines + during-training evaluators."""
import numpy as np

from sgpt_tpu.data import (InputExample, NoDuplicatesBatcher, build_nli_triplets,
                           MSMARCOTriplets)
from sgpt_tpu.data.msmarco import filter_hard_negatives
from sgpt_tpu.evaluation.sts import EmbeddingSimilarityEvaluator
from sgpt_tpu.evaluation.ir import InformationRetrievalEvaluator
from sgpt_tpu.training.schedules import make_schedule


def test_no_duplicates_batcher():
    examples = [InputExample(texts=(f"a{i % 4}", f"b{i}")) for i in range(32)]
    batcher = NoDuplicatesBatcher(examples, batch_size=4)
    for batch in batcher:
        texts = [t.lower() for ex in batch for t in ex.texts]
        assert len(texts) == len(set(texts)), "duplicate text in batch"


def test_nli_triplet_construction():
    rows = [
        ("the premise", "it is entailed", "entailment"),
        ("the premise", "it is contradicted", "contradiction"),
        ("the premise", "another entailment", "entailment"),
        ("no-contradiction premise", "entailed only", "entailment"),
        ("neutral premise", "whatever", "neutral"),
    ]
    triplets = build_nli_triplets(rows)
    # only 'the premise' group has both sides → 2 triplets (one per positive)
    assert len(triplets) == 2
    for t in triplets:
        assert t.texts[0] == "the premise"
        assert t.texts[2] == "it is contradicted"


def test_msmarco_ce_margin_filter():
    negs = [("n1", 5.0), ("n2", 1.0), ("n3", -2.0)]
    kept = filter_hard_negatives(negs, positive_scores=[6.0, 4.5], ce_margin=3.0)
    # threshold = min(6.0, 4.5) - 3.0 = 1.5 → keep n2, n3
    assert kept == ["n2", "n3"]


def test_msmarco_pop_rotate():
    queries = {"q": "the query"}
    corpus = {"p1": "pos one", "p2": "pos two", "n1": "neg one"}
    ds = MSMARCOTriplets(queries, corpus, {"q": {"pos": ["p1", "p2"], "neg": ["n1"]}})
    e1, e2, e3 = ds.example("q"), ds.example("q"), ds.example("q")
    assert e1.texts[1] == "pos one" and e2.texts[1] == "pos two"
    assert e3.texts[1] == "pos one"  # rotated back
    assert all(e.texts[2] == "neg one" for e in (e1, e2, e3))


def test_sts_evaluator_perfect_and_inverted():
    s1 = [f"s{i}" for i in range(8)]
    gold = list(np.linspace(0, 1, 8))
    emb = {f"s{i}": np.asarray([i + 1.0, 0.0]) for i in range(8)}
    # identical sentence pairs, embeddings whose cosine to a fixed ref varies
    ev = EmbeddingSimilarityEvaluator(s1, ["s7"] * 8, gold)

    def encode(texts):
        return np.stack([[emb[t][0], 1.0] for t in texts])

    score = ev(encode)
    assert score > 0.99  # monotone mapping ⇒ spearman 1


def test_ir_evaluator_perfect_ranking():
    queries = {"q1": "apple", "q2": "banana"}
    corpus = {"d1": "apple", "d2": "banana", "d3": "cherry"}
    relevant = {"q1": {"d1"}, "q2": {"d2"}}
    vocab = {"apple": [1, 0, 0], "banana": [0, 1, 0], "cherry": [0, 0, 1]}

    def encode(texts):
        return np.asarray([vocab[t] for t in texts], np.float32)

    ev = InformationRetrievalEvaluator(queries, corpus, relevant,
                                       main_metric="ndcg@10")
    assert ev(encode) == 1.0
    full = ev.compute(encode)
    assert full["mrr@10"] == 1.0 and full["recall@1"] == 1.0


def test_schedules():
    s = make_schedule("warmuplinear", 1.0, 10, 100)
    assert float(s(0)) == 0.0
    assert abs(float(s(10)) - 1.0) < 1e-6
    assert float(s(100)) < 0.02
    c = make_schedule("constantlr", 0.5, 0, 100)
    assert float(c(50)) == 0.5
    wc = make_schedule("warmupconstant", 1.0, 10, 100)
    assert abs(float(wc(50)) - 1.0) < 1e-6
    cos = make_schedule("warmupcosine", 1.0, 10, 100)
    assert abs(float(cos(10)) - 1.0) < 1e-6 and float(cos(99)) < 0.01
    # default matches the ST/transformers default num_cycles=1: one cosine
    # decay, no mid-training restart
    hr1 = make_schedule("warmupcosinewithhardrestarts", 1.0, 10, 100)
    assert abs(float(hr1(10)) - 1.0) < 1e-6     # warmup done
    assert float(hr1(55)) < 1.0                 # decaying, no restart
    assert float(hr1(99)) < 0.05
    # explicit cycles=3: lr returns to the peak at each cycle boundary
    from sgpt_tpu.training.schedules import warmup_cosine_hard_restarts
    hr = warmup_cosine_hard_restarts(1.0, 10, 100, cycles=3)
    assert abs(float(hr(10)) - 1.0) < 1e-6
    assert float(hr(39)) < 0.05                 # end of cycle 1 (30 steps)
    assert abs(float(hr(40)) - 1.0) < 1e-6      # restart at peak
    assert float(hr(69)) < 0.05
    assert abs(float(hr(70)) - 1.0) < 1e-6
