"""Int8 quantized inference (ops/quant.py).

The reference serves fp16/fp32 (no quantization anywhere in-repo); this is a
TPU-native serving extension, so the contract tested here is self-imposed:
quantized encode must agree with the bf16 path to high cosine similarity and
must preserve retrieval rankings.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.encoder import EmbeddingEngine
from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.models.decoder import forward
from sgpt_tpu.ops.quant import (
    quantize_weight, quantize_decoder_params, int8_project, dequantize_weight,
    is_quantized,
)
from sgpt_tpu.tokenization import SimpleTokenizer


def test_quantize_weight_roundtrip_error():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 48)).astype(np.float32)
    qw = quantize_weight(jnp.asarray(w), contract_axis=0)
    assert qw["q"].dtype == jnp.int8
    assert qw["s"].shape == (1, 48)
    back = dequantize_weight(qw)
    # symmetric per-channel: max abs error per channel <= s/2 = absmax/254
    per_chan_bound = np.abs(w).max(axis=0) / 254.0 + 1e-7
    assert (np.abs(back - w).max(axis=0) <= per_chan_bound).all()


def test_quantize_weight_stacked_axis():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(3, 16, 24)).astype(np.float32)  # (L, D, F)
    qw = quantize_weight(jnp.asarray(w), contract_axis=1)
    assert qw["s"].shape == (3, 1, 24)
    # extreme per-layer scale differences must not bleed across layers
    w2 = w.copy()
    w2[2] *= 1000.0
    qw2 = quantize_weight(jnp.asarray(w2), contract_axis=1)
    np.testing.assert_allclose(np.asarray(qw2["q"][0]), np.asarray(qw["q"][0]))


def test_int8_project_matches_float():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 7, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 20)).astype(np.float32))
    y_ref = np.asarray(x @ w)
    y_q = np.asarray(int8_project(x, quantize_weight(w)))
    # int8 dynamic quant: relative error ~1%, not exact
    denom = np.abs(y_ref).mean() + 1e-6
    assert np.abs(y_q - y_ref).mean() / denom < 0.02


def test_quantize_decoder_params_structure():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    qp = quantize_decoder_params(params)
    for k in ("wq", "wk", "wv", "wo"):
        assert is_quantized(qp["layers"]["attn"][k])
    for k in ("wi", "wo"):
        assert is_quantized(qp["layers"]["mlp"][k])
    # non-projection leaves untouched (same objects)
    assert qp["wte"] is params["wte"]
    assert qp["ln_f"] is params["ln_f"]
    assert not is_quantized(qp["layers"]["attn"].get("bq", None) or {})


def test_quantize_default_preserves_source_tree():
    """The default is a COPY: the caller's float tree must stay float —
    quantizing it in place would silently break any other user of the tree
    (a float engine sharing params, later training) and made the int8-vs-
    float parity tests above vacuous (review finding)."""
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    wq_before = params["layers"]["attn"]["wq"]
    qp = quantize_decoder_params(params)
    assert qp is not params
    assert params["layers"]["attn"]["wq"] is wq_before      # untouched
    assert not is_quantized(params["layers"]["attn"]["wq"])
    assert is_quantized(qp["layers"]["attn"]["wq"])


def test_quantize_free_source_mutates_in_place():
    """free_source=True is the big-model load path: the SAME tree comes back
    with its float kernels replaced (each freed as its int8 copy lands, so
    a 12.2 GB GPT-J quantizes within one 16 GB chip — docs/PERF.md)."""
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    ref = forward(params, jnp.zeros((1, 8), jnp.int32),
                  jnp.ones((1, 8), jnp.int32), cfg)
    qp = quantize_decoder_params(params, free_source=True)
    assert qp is params
    assert is_quantized(params["layers"]["attn"]["wq"])
    out = forward(qp, jnp.zeros((1, 8), jnp.int32),
                  jnp.ones((1, 8), jnp.int32), cfg)
    # still a working decoder, close to the float forward
    cos = float(jnp.sum(ref * out) /
                (jnp.linalg.norm(ref) * jnp.linalg.norm(out)))
    assert cos > 0.999


@pytest.mark.parametrize("family", ["neo", "gptj", "bloom"])
def test_quantized_forward_cosine(family):
    cfg = tiny(family)
    params = init_params(cfg, jax.random.key(0))
    qp = quantize_decoder_params(params)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)), jnp.int32)
    mask = jnp.asarray(np.array([[1] * 12, [1] * 9 + [0] * 3], np.int32))
    h_f = np.asarray(forward(params, ids, mask, cfg), np.float32)
    h_q = np.asarray(forward(qp, ids, mask, cfg), np.float32)
    num = (h_f * h_q).sum(-1)
    cos = num / (np.linalg.norm(h_f, axis=-1) * np.linalg.norm(h_q, axis=-1) + 1e-9)
    assert cos.min() > 0.99


def test_engine_quantized_encode_preserves_rankings():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    texts = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota kappa",
             "lambda mu", "nu xi omicron pi rho sigma"]
    base = EmbeddingEngine(params, cfg, tok, method="weightedmean",
                           batch_size=4, normalize_embeddings=True)
    quant = EmbeddingEngine(params, cfg, tok, method="weightedmean",
                            batch_size=4, normalize_embeddings=True,
                            quantize="int8")
    e_f = base.encode(texts)
    e_q = quant.encode(texts)
    assert e_q.shape == e_f.shape
    cos = (e_f * e_q).sum(-1)  # both unit-norm
    assert cos.min() > 0.99
    # retrieval ordering against the first text as query is preserved
    order_f = np.argsort(-(e_f @ e_f[0]))
    order_q = np.argsort(-(e_q @ e_q[0]))
    np.testing.assert_array_equal(order_f, order_q)


def test_crossencoder_quantized_ranking_agrees():
    from sgpt_tpu.crossencoder import CrossEncoderRanker

    cfg = tiny("gptj", vocab_size=512)
    params = init_params(cfg, jax.random.key(1))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    pairs = [("what is alpha", "alpha is a greek letter"),
             ("what is alpha", "unrelated text about beta"),
             ("what is alpha", "alpha alpha alpha"),
             ("what is alpha", "gamma delta epsilon zeta")]
    base = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=48)
    quant = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=48,
                               quantize="int8")
    s_f = np.asarray(base.predict(pairs))
    s_q = np.asarray(quant.predict(pairs))
    # A random-init model scores all docs nearly identically, so rank order
    # is noise here (the engine test covers ranking); assert the log-prob
    # sums themselves agree to ~1% of their magnitude instead.
    assert np.abs(s_f - s_q).max() < 0.02 * np.abs(s_f).max()


def test_engine_rejects_unknown_quantize():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    with pytest.raises(ValueError, match="quantize"):
        EmbeddingEngine(params, cfg, SimpleTokenizer(vocab_size=cfg.vocab_size),
                        quantize="fp4")
