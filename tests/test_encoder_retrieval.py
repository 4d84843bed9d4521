"""End-to-end: tokenize → encode → retrieve → evaluate on a synthetic BEIR dataset.

This is the minimum-slice integration test from SURVEY.md §7 (layers 1-5,
zero training): a tiny random GPT must retrieve lexically-identical docs
for their own queries (identical text ⇒ identical embedding ⇒ cos=1).
"""
import json
import os

import numpy as np
import pytest

import jax

from sgpt_tpu.encoder import EmbeddingEngine
from sgpt_tpu.evaluation import EvaluateRetrieval, load_beir_dataset
from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.retrieval import DenseRetriever
from sgpt_tpu.tokenization import SimpleTokenizer


@pytest.fixture(scope="module")
def engine():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    return EmbeddingEngine(params, cfg, SimpleTokenizer(vocab_size=cfg.vocab_size),
                           method="weightedmean", specb=True, batch_size=4)


def test_encode_shapes_and_determinism(engine):
    texts = ["alpha beta gamma", "delta", "epsilon zeta eta theta iota"]
    e1 = engine.encode(texts)
    e2 = engine.encode(texts)
    assert e1.shape == (3, engine.cfg.hidden_size)
    np.testing.assert_array_equal(e1, e2)  # deterministic (useb README contract)


def test_order_invariance(engine):
    texts = ["one two three", "a much longer document with many words inside it", "short"]
    fwd = engine.encode(texts)
    rev = engine.encode(texts[::-1])
    np.testing.assert_allclose(fwd, rev[::-1], atol=1e-5)


def test_fetch_pipeline_depth_does_not_change_results(engine):
    """The depth-2 D2H pipeline is a pure scheduling change: results must be
    bit-identical to the synchronous (depth-1) fetch order."""
    import sgpt_tpu.encoder as enc_mod

    texts = [f"text {i} " + "pad " * (i % 7) for i in range(13)]
    assert enc_mod.FETCH_PIPELINE_DEPTH == 2
    piped = engine.encode(texts)
    enc_mod.FETCH_PIPELINE_DEPTH = 1
    try:
        sync = engine.encode(texts)
    finally:
        enc_mod.FETCH_PIPELINE_DEPTH = 2
    np.testing.assert_array_equal(piped, sync)


def test_query_doc_specb_differ(engine):
    q = engine.encode(["same text"], is_query=True)
    d = engine.encode(["same text"], is_query=False)
    assert np.abs(q - d).max() > 1e-4  # brackets must change the embedding


def test_end_to_end_retrieval(tmp_path, engine):
    docs = {
        "d0": "the quick brown fox jumps over the lazy dog",
        "d1": "semantic search with neural sentence embeddings",
        "d2": "cooking pasta requires boiling salted water",
        "d3": "quantum computing uses superconducting qubits",
        "d4": "the stock market closed higher on friday",
    }
    # identical-text queries must retrieve their own doc at rank 1
    corpus = {d: {"title": "", "text": t} for d, t in docs.items()}
    queries = {f"q{i}": docs[f"d{i}"] for i in range(5)}
    qrels = {f"q{i}": {f"d{i}": 1} for i in range(5)}

    retriever = DenseRetriever(engine, score_function="cos_sim", device_chunk=128)
    ev = EvaluateRetrieval(retriever, k_values=(1, 3, 5))
    results = ev.retrieve(corpus, queries)
    ndcg, _map, recall, precision = ev.evaluate(qrels, results, (1, 3, 5))
    assert ndcg["NDCG@1"] == 1.0, f"self-retrieval failed: {results}"
    assert recall["Recall@1"] == 1.0


def test_multi_chunk_retrieval_matches_bruteforce(engine):
    """Corpus larger than corpus_chunk_size: the running host merge across
    chunks must equal one-shot brute force."""
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(50)]
    docs = {f"d{i}": " ".join(rng.choice(words, size=6)) for i in range(60)}
    corpus = {d: {"title": "", "text": t} for d, t in docs.items()}
    queries = {f"q{i}": docs[f"d{i * 7}"] for i in range(5)}

    chunked = DenseRetriever(engine, corpus_chunk_size=17, device_chunk=128)
    single = DenseRetriever(engine, corpus_chunk_size=10_000, device_chunk=128)
    r1 = chunked.search(corpus, queries, top_k=10)
    r2 = single.search(corpus, queries, top_k=10)
    for qid in queries:
        assert set(r1[qid]) == set(r2[qid]), qid
        for d in r1[qid]:
            assert abs(r1[qid][d] - r2[qid][d]) < 1e-5


def test_beir_loader_roundtrip(tmp_path):
    os.makedirs(tmp_path / "qrels")
    with open(tmp_path / "corpus.jsonl", "w") as f:
        f.write(json.dumps({"_id": "d1", "title": "T", "text": "hello"}) + "\n")
        f.write(json.dumps({"_id": "d2", "title": "", "text": ""}) + "\n")  # empty → dropped
    with open(tmp_path / "queries.jsonl", "w") as f:
        f.write(json.dumps({"_id": "q1", "text": "hi"}) + "\n")
        f.write(json.dumps({"_id": "q2", "text": "not in qrels"}) + "\n")
    with open(tmp_path / "qrels" / "test.tsv", "w") as f:
        f.write("query-id\tcorpus-id\tscore\nq1\td1\t1\n")
    corpus, queries, qrels = load_beir_dataset(str(tmp_path), "test")
    assert list(corpus) == ["d1"]
    assert list(queries) == ["q1"]  # q2 not in qrels → dropped
    assert qrels == {"q1": {"d1": 1}}


def test_embedding_cache(tmp_path):
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    eng = EmbeddingEngine(params, cfg, SimpleTokenizer(vocab_size=cfg.vocab_size),
                          cache_dir=str(tmp_path), batch_size=2)
    texts = ["cache me", "if you can"]
    e1 = eng.encode(texts)
    assert len(os.listdir(tmp_path)) == 1
    e2 = eng.encode(texts)  # hits cache
    np.testing.assert_array_equal(e1, e2)


def test_layeridx_selection():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    e_last = EmbeddingEngine(params, cfg, tok, layeridx=-1).encode(["a b c"])
    e_mid = EmbeddingEngine(params, cfg, tok, layeridx=2).encode(["a b c"])
    assert np.abs(e_last - e_mid).max() > 1e-5


def test_stack_pooling_methods():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    for method in ("meanmean", "lasttokenmean"):
        e = EmbeddingEngine(params, cfg, tok, method=method).encode(["x y z"])
        assert e.shape == (1, cfg.hidden_size)
        assert np.isfinite(e).all()


def test_encode_token_budget_batching_matches_single():
    """Mixed-length inputs (token-budget batching groups them into different
    (B, T) dispatches, encoder._rows_for_bucket) must embed each text exactly
    as encoding it alone."""
    from sgpt_tpu.models import tiny as tiny_cfg

    cfg = tiny_cfg("neo")
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    eng = EmbeddingEngine(params, cfg, tok, method="weightedmean",
                          batch_size=2, max_seq_len=64,
                          normalize_embeddings=True)
    rng = np.random.default_rng(7)
    texts = [" ".join(f"w{rng.integers(0, 50)}"
                      for _ in range(int(n))) for n in
             [2, 40, 3, 25, 60, 1, 12, 33, 5, 50, 8]]
    batched = eng.encode(texts)
    for i, t in enumerate(texts):
        single = eng.encode([t])
        np.testing.assert_allclose(batched[i], single[0], atol=2e-5)


def test_chain_group_plan():
    """Greedy pow2 decomposition of same-shape runs, immediate singles."""
    from sgpt_tpu.encoder import _chain_group_sizes
    A, B = (4, 64), (8, 32)
    # run of 13 A's then 3 B's, chain 8 -> 8+4+1 and 2+1
    sizes = _chain_group_sizes([A] * 13 + [B] * 3, 8)
    assert sizes == [8, 0, 0, 0, 0, 0, 0, 0, 4, 0, 0, 0, 1, 2, 0, 1]
    # chain caps at largest pow2 <= chain (6 -> 4)
    assert _chain_group_sizes([A] * 6, 6) == [4, 0, 0, 0, 2, 0]
    # chain=1 and singleton runs: everything dispatches singly
    assert _chain_group_sizes([A, B, A], 8) == [1, 1, 1]
    assert _chain_group_sizes([A] * 5, 1) == [1] * 5
    assert _chain_group_sizes([], 8) == []


def test_dispatch_chain_equality():
    """Chained bulk dispatch (dispatch_chain>1: k same-shape batches through
    ONE lax.map jit, encoder._embed_chain_step) must reproduce per-batch
    dispatch exactly — full chains, the partial-group single-dispatch tail,
    and bucket-shape changes mid-stream all covered by a ragged mix."""
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    rng = np.random.default_rng(3)
    texts = [" ".join(f"w{rng.integers(1000)}" for _ in range(int(n)))
             for n in np.clip(rng.lognormal(2.5, 0.7, 90), 2, 60)]
    kw = dict(batch_size=4, normalize_embeddings=True, max_seq_len=64)
    single = EmbeddingEngine(params, cfg, tok, dispatch_chain=1,
                             **kw).encode(texts)
    chained = EmbeddingEngine(params, cfg, tok, dispatch_chain=3,
                              **kw).encode(texts)
    assert np.allclose(chained, single, atol=2e-6)
