"""SGPTModel pipeline: dense heads, learnt-mean, asym towers, save/load roundtrip."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.model import AsymModel, SGPTModel
from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.tokenization import SimpleTokenizer


@pytest.fixture(scope="module")
def base():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    return params, cfg, tok


def test_dense_head_post_pool_changes_dim(base):
    params, cfg, tok = base
    rng = np.random.default_rng(0)
    head = {"w": rng.normal(size=(cfg.hidden_size, 16)).astype(np.float32),
            "b": np.zeros(16, np.float32), "activation": "identity",
            "location": "post_pool"}
    m = SGPTModel(params, cfg, tok, dense_heads=[head])
    emb = m.encode(["hello world"])
    assert emb.shape == (1, 16)
    # identity activation, zero bias ⇒ head output == plain embedding @ w
    plain = SGPTModel(params, cfg, tok).encode(["hello world"])
    np.testing.assert_allclose(emb, plain @ head["w"], atol=1e-4)


def test_dense_head_pre_pool(base):
    params, cfg, tok = base
    rng = np.random.default_rng(1)
    head = {"w": rng.normal(size=(cfg.hidden_size, cfg.hidden_size)).astype(np.float32),
            "activation": "gelu", "location": "pre_pool"}
    m = SGPTModel(params, cfg, tok, dense_heads=[head])
    emb = m.encode(["the linearthenpool path"])
    assert emb.shape == (1, cfg.hidden_size)
    assert np.isfinite(emb).all()
    plain = SGPTModel(params, cfg, tok).encode(["the linearthenpool path"])
    assert np.abs(emb - plain).max() > 1e-4


def test_learned_weights_pipeline(base):
    params, cfg, tok = base
    lw = jnp.ones((128,), jnp.float32)
    m = SGPTModel(params, cfg, tok, method="learned_weightedmean",
                  learned_weights=lw)
    mean = SGPTModel(params, cfg, tok, method="mean")
    np.testing.assert_allclose(m.encode(["a b c"]), mean.encode(["a b c"]),
                               atol=1e-5)


def test_save_load_roundtrip(base, tmp_path):
    params, cfg, tok = base
    rng = np.random.default_rng(2)
    head = {"w": rng.normal(size=(cfg.hidden_size, 8)).astype(np.float32),
            "b": rng.normal(size=8).astype(np.float32),
            "activation": "tanh", "location": "post_pool"}
    m = SGPTModel(params, cfg, tok, method="weightedmean", specb=True,
                  normalize=True, dense_heads=[head],
                  learned_weights=jnp.arange(1.0, 129.0))
    want = m.encode(["roundtrip text"], is_query=True)
    m.save(str(tmp_path / "model"))

    m2 = SGPTModel.load(str(tmp_path / "model"), tokenizer=tok)
    assert m2.specb and m2.normalize
    got = m2.encode(["roundtrip text"], is_query=True)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_asym_routing_and_roundtrip(base, tmp_path):
    params, cfg, tok = base
    params2 = init_params(cfg, jax.random.key(9))
    asym = AsymModel(SGPTModel(params, cfg, tok), SGPTModel(params2, cfg, tok))
    q = asym.encode(["same text"], is_query=True)
    d = asym.encode(["same text"], is_query=False)
    assert np.abs(q - d).max() > 1e-3  # different towers

    asym.save(str(tmp_path / "asym"))
    asym2 = AsymModel.load(str(tmp_path / "asym"), tokenizer=tok)
    np.testing.assert_allclose(asym2.encode(["same text"], is_query=True), q,
                               atol=1e-5)
