"""BM25 index + embedding-space search utilities."""
import numpy as np
import pytest

from sgpt_tpu.retrieval_bm25 import BM25Index, BM25Retriever, tokenize
from sgpt_tpu.ops.search_utils import (semantic_search,
                                       paraphrase_mining_embeddings,
                                       community_detection)


CORPUS = {
    "d1": {"title": "", "text": "the quick brown fox jumps over the lazy dog"},
    "d2": {"title": "", "text": "neural networks learn dense representations"},
    "d3": {"title": "fox", "text": "foxes are small wild canines"},
    "d4": {"title": "", "text": "cooking pasta in salted boiling water"},
}


def test_tokenize():
    assert tokenize("Hello, World! 123") == ["hello", "world", "123"]


def test_bm25_relevance_ordering():
    idx = BM25Index.build(CORPUS)
    res = idx.search_one("brown fox", top_k=4)
    assert list(res)[0] == "d1"          # both terms
    assert "d3" in res                    # one term (fox)
    assert "d4" not in res                # no overlap


def test_bm25_idf_downweights_common_terms():
    idx = BM25Index.build(CORPUS)
    # "the" appears in one doc here; use a term in all docs
    corpus = {f"d{i}": {"text": f"common word{i}"} for i in range(4)}
    idx2 = BM25Index.build(corpus)
    res = idx2.search_one("common word2", top_k=4)
    assert list(res)[0] == "d2"


def test_bm25_retriever_interface():
    r = BM25Retriever()
    res = r.search(CORPUS, {"q1": "lazy dog", "q2": "pasta water"}, top_k=2)
    assert list(res["q1"])[0] == "d1"
    assert list(res["q2"])[0] == "d4"


def test_bm25_feeds_crossencoder_rerank():
    import jax
    from sgpt_tpu.crossencoder import CrossEncoderRanker, rerank
    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer

    first = BM25Retriever().search(CORPUS, {"q": "brown fox"}, top_k=3)
    cfg = tiny("neo", vocab_size=512)
    ranker = CrossEncoderRanker(init_params(cfg, jax.random.key(0)), cfg,
                                SimpleTokenizer(vocab_size=512),
                                batch_size=2, max_length=64)
    out = rerank(ranker, CORPUS, {"q": "brown fox"}, first, top_k=3)
    assert len(out["q"]) == len(first["q"])


def test_semantic_search_output_shape():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    c = rng.normal(size=(50, 16)).astype(np.float32)
    res = semantic_search(q, c, top_k=5)
    assert len(res) == 3 and len(res[0]) == 5
    assert res[0][0]["score"] >= res[0][-1]["score"]
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    cn = c / np.linalg.norm(c, axis=1, keepdims=True)
    want = np.argmax(qn @ cn.T, axis=1)
    assert [r[0]["corpus_id"] for r in res] == want.tolist()


def test_paraphrase_mining():
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(10, 8)).astype(np.float32)
    emb[7] = emb[2] * 1.5  # same direction → cosine 1
    pairs = paraphrase_mining_embeddings(emb, top_k=5)
    assert pairs[0][1:] == [2, 7]
    assert pairs[0][0] == pytest.approx(1.0, abs=1e-5)
    assert all(p[1] < p[2] for p in pairs)  # canonical order, no self-pairs


def test_community_detection():
    rng = np.random.default_rng(2)
    base1 = rng.normal(size=8)
    base2 = rng.normal(size=8)
    emb = np.stack([base1 + rng.normal(size=8) * 0.01 for _ in range(6)]
                   + [base2 + rng.normal(size=8) * 0.01 for _ in range(4)]
                   + [rng.normal(size=8) for _ in range(5)]).astype(np.float32)
    comms = community_detection(emb, threshold=0.9, min_community_size=3)
    assert len(comms) == 2
    assert sorted(map(len, comms), reverse=True) == [6, 4]
    assert set(comms[0]) == set(range(6))
