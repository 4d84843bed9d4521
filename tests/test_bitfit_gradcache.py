"""BitFit masking + GradCache correctness: chunked grads == direct grads."""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from sgpt_tpu.losses import mnrl_loss
from sgpt_tpu.models import tiny, init_params, count_params
from sgpt_tpu.models.decoder import forward
from sgpt_tpu.ops.pooling import weighted_mean_pool
from sgpt_tpu.training.bitfit import bitfit_mask, masked_optimizer, trainable_count
from sgpt_tpu.training.gradcache import (chunk_tree, gradcache_value_and_grad)


def test_bitfit_mask_selects_biases_only():
    cfg = tiny("bloom")  # has qkv biases
    params = init_params(cfg, jax.random.key(0))
    mask = bitfit_mask(params)
    assert mask["layers"]["attn"]["bq"] is True
    assert mask["layers"]["attn"]["wq"] is False
    assert mask["layers"]["ln1"]["bias"] is True
    assert mask["layers"]["ln1"]["scale"] is False
    assert mask["wte"] is False
    n_train = trainable_count(params)
    assert 0 < n_train < 0.02 * count_params(params)


def test_bitfit_mask_wte_flag():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    assert bitfit_mask(params, train_wte=True)["wte"] is True


def test_masked_optimizer_freezes_weights():
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    opt = masked_optimizer(optax.sgd(0.1), params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    assert float(jnp.abs(updates["layers"]["attn"]["wq"]).max()) == 0.0
    assert float(jnp.abs(updates["layers"]["mlp"]["bi"]).max()) > 0.0


def _toy_encode(params, chunk):
    """Tiny 'model': linear + tanh + mean pool, params a simple pytree."""
    h = jnp.tanh(chunk["x"] @ params["w"] + params["b"])
    return h


def test_gradcache_equals_direct():
    rng = np.random.default_rng(0)
    N, Din, D = 16, 6, 4
    params = {"w": jnp.asarray(rng.normal(size=(Din, D)), jnp.float32),
              "b": jnp.zeros((D,), jnp.float32)}
    xa = {"x": jnp.asarray(rng.normal(size=(N, Din)), jnp.float32)}
    xb = {"x": jnp.asarray(rng.normal(size=(N, Din)), jnp.float32)}

    # direct
    def direct_loss(p):
        return mnrl_loss(_toy_encode(p, xa), _toy_encode(p, xb))
    want_loss, want_grads = jax.value_and_grad(direct_loss)(params)

    # gradcache with chunk 4
    vg = gradcache_value_and_grad(_toy_encode, mnrl_loss)
    got_loss, got_grads = vg(params, chunk_tree(xa, 4), chunk_tree(xb, 4))

    assert abs(float(got_loss) - float(want_loss)) < 1e-5
    for k in params:
        np.testing.assert_allclose(np.asarray(got_grads[k]), np.asarray(want_grads[k]),
                                   atol=1e-5)


def test_gradcache_on_real_decoder():
    """GradCache grads == direct grads through the actual GPT encoder."""
    cfg = tiny("neo", num_layers=2, hidden_size=32, num_heads=2, vocab_size=64)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(1)
    N, T = 8, 10
    mk = lambda: {
        "ids": jnp.asarray(rng.integers(0, 64, size=(N, T)), jnp.int32),
        "mask": jnp.ones((N, T), jnp.int32),
    }
    xa, xb = mk(), mk()

    def encode(p, chunk):
        h = forward(p, chunk["ids"], chunk["mask"], cfg)
        return weighted_mean_pool(h, chunk["mask"])

    def direct(p):
        return mnrl_loss(encode(p, xa), encode(p, xb))
    want_loss, want_grads = jax.value_and_grad(direct)(params)

    vg = gradcache_value_and_grad(encode, mnrl_loss)
    got_loss, got_grads = jax.jit(vg)(params, chunk_tree(xa, 2), chunk_tree(xb, 2))

    assert abs(float(got_loss) - float(want_loss)) < 1e-5
    flat_w = jax.tree.leaves(want_grads)
    flat_g = jax.tree.leaves(got_grads)
    for w, g in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-4)
