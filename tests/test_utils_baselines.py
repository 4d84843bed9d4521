"""Parallelizer, io_utils, profiling, OpenAI baselines (with fake clients), YesNoRanker."""
import threading
import time

import numpy as np
import pytest

from sgpt_tpu.utils import (DataFrameParallelizer, ErrorHandling, retry,
                            unique_list, truncate_text_list, generate_unique,
                            Timer, ThroughputMeter)
from sgpt_tpu.baselines import OpenAIRetriever, openai_search, construct_context, get_score


def test_parallelizer_row_mode_preserves_order():
    def fn(row):
        time.sleep(0.001 * (5 - row["i"] % 5))
        return row["i"] * 2

    rows = [{"i": i} for i in range(20)]
    out = DataFrameParallelizer(fn, parallel_workers=8).run(rows)
    assert [r["output_response"] for r in out] == [i * 2 for i in range(20)]


def test_parallelizer_batch_mode_and_errors():
    def fn(batch):
        if batch[0]["i"] == 0:
            raise ValueError("boom")
        return [r["i"] for r in batch]

    rows = [{"i": i} for i in range(6)]
    out = DataFrameParallelizer(fn, batch_support=True, batch_size=2,
                                error_handling=ErrorHandling.LOG).run(rows)
    assert out[0]["output_error_type"] == "ValueError"
    assert out[2]["output_response"] == 2


def test_parallelizer_fail_mode_raises():
    def fn(row):
        raise RuntimeError("nope")

    with pytest.raises(RuntimeError):
        DataFrameParallelizer(fn, error_handling=ErrorHandling.FAIL).run([{"a": 1}])


def test_parallelizer_pandas_roundtrip():
    pd = pytest.importorskip("pandas")
    df = pd.DataFrame({"x": [1, 2, 3]})
    out = DataFrameParallelizer(lambda r: r["x"] + 1).run(df)
    assert list(out["output_response"]) == [2, 3, 4]


def test_retry_decorator():
    calls = []

    @retry(tries=3, delay=0.01)
    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise IOError("transient")
        return "ok"

    assert flaky() == "ok" and len(calls) == 3


def test_io_utils():
    assert unique_list([3, 1, 3, 2, 1]) == [3, 1, 2]
    assert truncate_text_list(["x" * 200])[0].endswith("(...)")
    assert generate_unique("a", ["a", "a_2"]) == "a_3"
    assert generate_unique("b", ["a"], prefix="p") == "p_b"


def test_profiling_utils():
    with Timer(sync=False) as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.01
    meter = ThroughputMeter()
    with meter.lap(100):
        time.sleep(0.01)
    assert meter.per_second > 0


def test_openai_retriever_fake_client(tmp_path):
    calls = []

    def embed_fn(texts, is_query):
        calls.append(len(texts))
        return [[hash(t) % 7, 1.0] for t in texts]

    r = OpenAIRetriever(embed_fn, batch_size=2, cache_dir=str(tmp_path))
    q = r.encode_queries(["alpha", "beta", "gamma"])
    assert q.shape == (3, 2)
    c = r.encode_corpus([{"title": "T", "text": "doc"}])
    assert c.shape == (1, 2)
    # cache hit: no new API calls
    n = len(calls)
    r.encode_queries(["alpha", "beta", "gamma"])
    assert len(calls) == n


def test_openai_retriever_retries_then_fails():
    attempts = []

    def embed_fn(texts, is_query):
        attempts.append(1)
        raise IOError("down")

    r = OpenAIRetriever(embed_fn, batch_size=10, retries=2)
    with pytest.raises(RuntimeError):
        r.encode_queries(["q"])
    assert len(attempts) == 2


def test_openai_search_scoring():
    # fake completion client: uniform logprob -1 per token, offsets by char
    def complete_fn(prompts):
        out = []
        for p in prompts:
            toks = p.split(" ")
            offsets, pos = [], 0
            for t in toks:
                offsets.append(pos)
                pos += len(t) + 1
            out.append({"token_logprobs": [-1.0] * len(toks),
                        "text_offset": offsets})
        return out

    res = openai_search("the query", ["docA", "docB"], complete_fn)
    assert [r["document"] for r in res] == [0, 1]
    assert all(isinstance(r["score"], float) for r in res)


def test_yesno_ranker():
    import jax
    from sgpt_tpu.crossencoder import YesNoRanker
    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("neo", vocab_size=512)
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=512)
    ranker = YesNoRanker(params, cfg, tok, batch_size=2, max_length=64)
    scores = ranker.predict([("a query", "a document"), ("other", "doc two")])
    assert len(scores) == 2
    assert all(s <= 0 for s in scores)  # log-probs
    # restricted 2-word vocab ⇒ P(Yes) + P(No) = 1 ⇒ logP(Yes) > log(tiny)
    assert all(s > -20 for s in scores)
