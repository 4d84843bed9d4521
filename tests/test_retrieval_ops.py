"""Similarity + chunked top-k vs numpy brute force (ref: util.py:24-66, exact_search.py:80-132)."""
import numpy as np
import jax.numpy as jnp

from sgpt_tpu.ops import (cos_sim, dot_score, pairwise_cos_sim, chunked_topk,
                          blockmax_topk)
from sgpt_tpu.ops.pooling import normalize


def test_cos_sim_vs_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(5, 16)).astype(np.float32)
    b = rng.normal(size=(7, 16)).astype(np.float32)
    got = np.asarray(cos_sim(jnp.asarray(a), jnp.asarray(b)))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(got, an @ bn.T, atol=1e-5)


def test_dot_and_pairwise():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(4, 8)).astype(np.float32)
    b = rng.normal(size=(4, 8)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(dot_score(jnp.asarray(a), jnp.asarray(b))),
                               a @ b.T, atol=1e-5)
    got = np.asarray(pairwise_cos_sim(jnp.asarray(a), jnp.asarray(b)))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(got, np.sum(an * bn, axis=1), atol=1e-5)


def test_chunked_topk_exact():
    rng = np.random.default_rng(2)
    Q, N, D, k = 9, 1000, 32, 13
    queries = rng.normal(size=(Q, D)).astype(np.float32)
    corpus = rng.normal(size=(N, D)).astype(np.float32)

    chunk = 128
    N_pad = ((N + chunk - 1) // chunk) * chunk
    corpus_pad = np.zeros((N_pad, D), np.float32)
    corpus_pad[:N] = corpus

    qn = np.asarray(normalize(jnp.asarray(queries)))
    cn = np.zeros_like(corpus_pad)
    cn[:N] = np.asarray(normalize(jnp.asarray(corpus)))

    vals, idx = chunked_topk(jnp.asarray(qn), jnp.asarray(cn), N, k=k, chunk_size=chunk)
    vals, idx = np.asarray(vals), np.asarray(idx)

    scores = qn @ cn[:N].T
    for qi in range(Q):
        want_idx = np.argsort(-scores[qi])[:k]
        np.testing.assert_allclose(sorted(vals[qi], reverse=True),
                                   np.sort(scores[qi][want_idx])[::-1], atol=1e-5)
        assert set(idx[qi]) == set(want_idx)
        assert (idx[qi] < N).all()


def test_blockmax_topk_exact_vs_bruteforce():
    rng = np.random.default_rng(7)
    Q, N, D, k = 11, 4096, 24, 50
    queries = rng.normal(size=(Q, D)).astype(np.float32)
    corpus = rng.normal(size=(N, D)).astype(np.float32)
    vals, idx = blockmax_topk(jnp.asarray(queries), jnp.asarray(corpus), N,
                              k=k, block_size=128, slab_size=1024)
    vals, idx = np.asarray(vals), np.asarray(idx)
    scores = queries @ corpus.T
    for qi in range(Q):
        want = np.sort(scores[qi])[::-1][:k]
        np.testing.assert_allclose(np.sort(vals[qi])[::-1], want, atol=1e-4)
        assert set(idx[qi]) == set(np.argsort(-scores[qi])[:k])


def test_blockmax_topk_clustered_topk_in_one_block():
    """Adversarial: ALL true top-k docs in a single block must still be found."""
    rng = np.random.default_rng(8)
    Q, N, D, k = 3, 1024, 16, 20
    queries = rng.normal(size=(Q, D)).astype(np.float32)
    corpus = rng.normal(size=(N, D)).astype(np.float32) * 0.01
    # plant k high-scoring docs inside block 2 (rows 256..275)
    for j in range(k):
        corpus[256 + j] = queries[0] * (2.0 + 0.01 * j)
    vals, idx = blockmax_topk(jnp.asarray(queries), jnp.asarray(corpus), N,
                              k=k, block_size=128, slab_size=512)
    scores = queries @ corpus.T
    assert set(np.asarray(idx)[0]) == set(np.argsort(-scores[0])[:k])


def test_blockmax_topk_valid_count_masking():
    rng = np.random.default_rng(9)
    Q, N, D, k = 4, 512, 8, 10
    queries = rng.normal(size=(Q, D)).astype(np.float32)
    corpus = rng.normal(size=(N, D)).astype(np.float32)
    corpus[400:] = 100.0  # huge scores in the padded region — must be masked
    vals, idx = blockmax_topk(jnp.asarray(queries), jnp.asarray(corpus), 400, k=k)
    assert (np.asarray(idx) < 400).all()
    scores = queries @ corpus[:400].T
    for qi in range(Q):
        assert set(np.asarray(idx)[qi]) == set(np.argsort(-scores[qi])[:k])


def test_chunked_topk_k_larger_than_chunk():
    rng = np.random.default_rng(3)
    Q, N, D, k, chunk = 3, 256, 8, 100, 64
    queries = rng.normal(size=(Q, D)).astype(np.float32)
    corpus = rng.normal(size=(N, D)).astype(np.float32)
    vals, idx = chunked_topk(jnp.asarray(queries), jnp.asarray(corpus), N, k=k, chunk_size=chunk)
    scores = queries @ corpus.T
    for qi in range(Q):
        want = np.sort(scores[qi])[::-1][:k]
        np.testing.assert_allclose(np.sort(np.asarray(vals[qi]))[::-1], want, atol=1e-4)
