"""Cross-encoder scoring parity with a direct re-implementation of the
reference algorithm (sgptce.py:150-260) executed step-by-step in numpy."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.crossencoder import CrossEncoderRanker, PROMPT_G, rerank
from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.models.decoder import forward, logits
from sgpt_tpu.tokenization import SimpleTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny("gptj", vocab_size=512)
    params = init_params(cfg, jax.random.key(1))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    return params, cfg, tok


def _reference_score(params, cfg, tok, query, doc, max_length, instruction_len,
                     prompt=PROMPT_G):
    """The torch algorithm from sgptce.py, replayed in numpy on our model."""
    ctx = tok.encode(prompt.format(doc))
    cont = tok.encode(query)
    ilen = instruction_len
    inp = (ctx[:ilen] + ((ctx[ilen:] + cont)[-(max_length + 1 - ilen):]))[:-1]
    ids = jnp.asarray(np.asarray(inp, np.int32)[None])
    mask = jnp.ones_like(ids)
    h = forward(params, ids, mask, cfg)
    lg = np.asarray(logits(params, h, cfg), np.float64)[0]
    lg = lg - lg.max(-1, keepdims=True)
    logp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
    inplen, contlen = len(inp), len(cont)
    window = logp[inplen - contlen : inplen]
    return float(sum(window[t, c] for t, c in enumerate(cont)))


def test_score_matches_reference_algorithm(setup):
    params, cfg, tok = setup
    ranker = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=64)
    pairs = [
        ("what is semantic search", "search over dense embeddings"),
        ("how to cook pasta", "boil water add salt and pasta"),
        ("what is semantic search", "boil water add salt and pasta"),
    ]
    got = ranker.predict(pairs)
    for (q, d), g in zip(pairs, got):
        want = _reference_score(params, cfg, tok, q, d, 64, ranker.instruction_len)
        assert abs(g - want) < 1e-3, f"{g} vs {want}"


def test_fetch_pipeline_depth_does_not_change_scores(setup):
    """Depth-2 D2H pipelining is scheduling only — scores are bit-identical."""
    import sgpt_tpu.crossencoder as ce_mod

    params, cfg, tok = setup
    ranker = CrossEncoderRanker(params, cfg, tok, batch_size=2, max_length=64)
    pairs = [(f"query {i}", f"doc {i} " + "w " * (i % 5)) for i in range(9)]
    assert ce_mod.FETCH_PIPELINE_DEPTH == 2
    piped = ranker.predict(pairs)
    ce_mod.FETCH_PIPELINE_DEPTH = 1
    try:
        sync = ranker.predict(pairs)
    finally:
        ce_mod.FETCH_PIPELINE_DEPTH = 2
    np.testing.assert_array_equal(piped, sync)


def test_relevant_doc_scores_higher_with_overlap(setup):
    params, cfg, tok = setup
    # identical continuation given matching vs non-matching context through a
    # random model is noise; instead check determinism + dedup behavior
    ranker = CrossEncoderRanker(params, cfg, tok, batch_size=2, max_length=64)
    pairs = [("q one", "doc a"), ("q one", "doc a"), ("q two", "doc b")]
    s = ranker.predict(pairs)
    assert s[0] == s[1]  # deduped identical requests share a score
    assert s[0] != s[2]


def test_left_truncation_preserves_instruction(setup):
    params, cfg, tok = setup
    ranker = CrossEncoderRanker(params, cfg, tok, batch_size=1, max_length=24)
    long_doc = " ".join(f"w{i}" for i in range(100))
    ctx = tok.encode(PROMPT_G.format(long_doc))
    cont = tok.encode("short query")
    inp, inplen, contlen = ranker._pack(ctx, cont)
    assert inplen <= 24
    ilen = ranker.instruction_len
    assert inp[:ilen] == ctx[:ilen]          # instruction prefix survives
    # inp = (packed ctx + cont)[:-1]: the last contlen-1 tokens are cont[:-1]
    assert inp[inplen - (contlen - 1):] == cont[:-1]


def test_vocab_subset_masking(setup):
    params, cfg, tok = setup
    ids = tok.encode("alpha beta gamma")
    ranker_all = CrossEncoderRanker(params, cfg, tok, batch_size=1, max_length=32)
    ranker_sub = CrossEncoderRanker(params, cfg, tok, batch_size=1, max_length=32,
                                    vocab_subset=list(range(cfg.vocab_size)))
    pairs = [("alpha beta", "some document")]
    # full-vocab subset == no subset
    np.testing.assert_allclose(ranker_all.predict(pairs), ranker_sub.predict(pairs),
                               rtol=1e-5)


def test_rerank_driver(setup):
    params, cfg, tok = setup
    ranker = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=64)
    corpus = {f"d{i}": {"title": "", "text": f"document number {i}"} for i in range(4)}
    queries = {"q0": "find document"}
    first = {"q0": {"d0": 3.0, "d1": 2.0, "d2": 1.0, "d3": 0.5}}
    out = rerank(ranker, corpus, queries, first, top_k=2)
    assert set(out["q0"]) == {"d0", "d1"}  # only top-2 first-stage docs rescored
    assert all(isinstance(v, float) for v in out["q0"].values())


def test_gathered_scorer_matches_full():
    """continuation_scores_gathered == continuation_scores (the LM head at
    only the scored positions is mathematically identical)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.ops.logprobs import (continuation_scores,
                                       continuation_scores_gathered)

    cfg = tiny("neo", num_layers=1, hidden_size=32, num_heads=2, vocab_size=128)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    B, T, C = 3, 24, 8
    ids = jnp.asarray(rng.integers(0, 128, (B, T)), jnp.int32)
    amask = jnp.ones((B, T), jnp.int32)
    # per-row continuation windows of varying length at varying offsets
    full_t = np.zeros((B, T), np.int32)
    full_m = np.zeros((B, T), np.float32)
    cpos = np.zeros((B, C), np.int32)
    ctgt = np.zeros((B, C), np.int32)
    cmask = np.zeros((B, C), np.float32)
    for b, (start, n) in enumerate(((4, 5), (10, 8), (0, 3))):
        tg = rng.integers(0, 128, n)
        full_t[b, start:start + n] = tg
        full_m[b, start:start + n] = 1.0
        cpos[b, :n] = np.arange(start, start + n)
        ctgt[b, :n] = tg
        cmask[b, :n] = 1.0
    want = continuation_scores(params, ids, amask, jnp.asarray(full_t),
                               jnp.asarray(full_m), cfg)
    got = continuation_scores_gathered(params, ids, amask, jnp.asarray(cpos),
                                       jnp.asarray(ctgt), jnp.asarray(cmask),
                                       cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
    # vocab-restricted variant too
    vm = np.zeros(128, bool); vm[:64] = True
    want_v = continuation_scores(params, ids, amask, jnp.asarray(full_t % 64),
                                 jnp.asarray(full_m), cfg, jnp.asarray(vm))
    got_v = continuation_scores_gathered(params, ids, amask, jnp.asarray(cpos),
                                         jnp.asarray(ctgt % 64),
                                         jnp.asarray(cmask), cfg,
                                         jnp.asarray(vm))
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v), rtol=1e-6)
