"""CE prompt ablation registry (crossencoder_beir_sgpt.ipynb cells 10-17)."""
import numpy as np
import pytest

import jax

from sgpt_tpu.ce_prompts import (ALL_PROMPT_IDS, FEW_SHOT, YES_NO, ZERO_SHOT,
                                 build_ranker, select_fewshot)
from sgpt_tpu.crossencoder import PROMPT_G, CrossEncoderRanker, YesNoRanker
from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.tokenization import SimpleTokenizer

CFG = tiny("neo", num_layers=1, hidden_size=32, num_heads=2, vocab_size=256)
PARAMS = init_params(CFG, jax.random.key(0))
TOK = SimpleTokenizer(vocab_size=256)


def test_registry_complete():
    # 9 letter + 4 quora zero-shot, 3 few-shot, 2 yes/no = the notebook set
    assert set(ZERO_SHOT) == {"A", "B", "C", "D", "E", "F", "G", "H", "I",
                              "quoraA", "quoraB", "quoraC", "quoraD"}
    assert set(FEW_SHOT) == {"J", "K", "quoraE"}
    assert set(YES_NO) == {"L", "M"}
    assert len(ALL_PROMPT_IDS) == 18
    assert ZERO_SHOT["G"] == PROMPT_G  # registry agrees with the main prompt


@pytest.mark.parametrize("pid", ["A", "G", "I", "quoraC"])
def test_zero_shot_rankers_score(pid):
    r = build_ranker(pid, PARAMS, CFG, TOK, batch_size=2, max_length=64)
    assert isinstance(r, CrossEncoderRanker)
    scores = r.predict([("what is jax", "jax is an array library"),
                        ("what is jax", "bananas are yellow")])
    assert len(scores) == 2 and all(np.isfinite(scores))


def test_fewshot_ranker_requires_shot_and_scores():
    with pytest.raises(ValueError, match="few-shot"):
        build_ranker("J", PARAMS, CFG, TOK)
    r = build_ranker("J", PARAMS, CFG, TOK,
                     fewshots=("example doc", "example query"),
                     batch_size=2, max_length=64)
    assert r.fewshot_prefix.startswith("Documents are searched")
    assert "example doc" in r.fewshot_prefix
    scores = r.predict([("q one", "document body one"),
                        ("q two", "document body two")])
    assert len(scores) == 2 and all(np.isfinite(scores))


@pytest.mark.parametrize("pid,cont", [("L", " Yes"), ("M", "Yes")])
def test_yesno_rankers(pid, cont):
    r = build_ranker(pid, PARAMS, CFG, TOK, batch_size=2, max_length=64)
    assert isinstance(r, YesNoRanker)
    assert r.continuation == cont
    scores = r.predict([("query a", "doc a"), ("query b", "doc b")])
    assert len(scores) == 2 and all(np.isfinite(scores))
    # vocab restriction: log P(Yes) among {Yes, No} is > log(tiny epsilon)
    assert all(s > -50 for s in scores)


def test_yesno_fewshot_appends_continuation():
    r = build_ranker("L", PARAMS, CFG, TOK,
                     fewshots=("shot doc", "shot query"),
                     batch_size=1, max_length=64)
    assert r.fewshot_prefix.endswith(" Yes")
    scores = r.predict([("query", "doc")])
    assert np.isfinite(scores[0])


def test_prompts_change_scores():
    pairs = [("what is jax", "jax is an array library for accelerators")]
    got = {pid: build_ranker(pid, PARAMS, CFG, TOK, batch_size=1,
                             max_length=64).predict(pairs)[0]
           for pid in ("A", "G")}
    assert got["A"] != got["G"]


def test_select_fewshot_shortest_pair():
    corpus = {"d1": {"text": "one two three four five six seven"},
              "d2": {"text": "short doc"},
              "d3": {"text": "a much longer document with many more words"}}
    queries = {"q1": "long query with words", "q2": "tiny q"}
    qrels = {"q1": {"d3": 1}, "q2": {"d2": 1, "d1": 1}}
    doc, query = select_fewshot(corpus, queries, qrels, TOK)
    assert (doc, query) == ("short doc", "tiny q")
    # score weighting: higher-score rel wins over shorter low-score one
    qrels2 = {"q2": {"d2": 1, "d1": 100}}
    doc2, _ = select_fewshot(corpus, queries, qrels2, TOK)
    assert doc2 == corpus["d1"]["text"]
    # min length guard skips the degenerate pair
    doc3, _ = select_fewshot(corpus, queries, qrels, TOK,
                             min_corp_query_len=6)
    assert doc3 != "short doc"
    with pytest.raises(ValueError):
        select_fewshot(corpus, queries, {}, TOK)


def test_unknown_prompt_id():
    with pytest.raises(ValueError, match="unknown prompt id"):
        build_ranker("Z", PARAMS, CFG, TOK)
