"""flash_attention_trainable gradients == jax.grad through XLA attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.models.decoder import alibi_slopes
from sgpt_tpu.ops.pallas.flash_attention import flash_attention_trainable


def _xla_attention(q, k, v, key_mask, scale=1.0, window=0, slopes=None):
    T = q.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) * scale
    i = np.arange(T)
    mask = i[None, :] <= i[:, None]
    if window > 0:
        mask = mask & (i[None, :] > i[:, None] - window)
    mask = jnp.asarray(mask)[None, None] & key_mask[:, None, None, :].astype(bool)
    if slopes is not None:
        s = s + slopes[None, :, None, None] * jnp.arange(T, dtype=jnp.float32)[None, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      precision=jax.lax.Precision.HIGHEST)


def _mk(B=1, H=2, T=256, Dh=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, T, Dh)) * 0.3, jnp.float32)
    mask = np.ones((B, T), np.int32)
    mask[0, T - 30:] = 0
    return mk(), mk(), mk(), jnp.asarray(mask)


@pytest.mark.parametrize("window,use_alibi,scale", [
    (0, False, 0.17677),   # global scaled
    (0, False, 1.0),       # gpt-neo unscaled
    (64, False, 0.17677),  # local window
    (0, True, 0.17677),    # alibi
])
def test_flash_grads_match_xla(window, use_alibi, scale):
    q, k, v, mask = _mk(seed=window + int(use_alibi))
    slopes = alibi_slopes(2) if use_alibi else None

    def loss_flash(q, k, v):
        out = flash_attention_trainable(q, k, v, mask, slopes, scale, window, 128)
        return jnp.sum(out * out)

    def loss_xla(q, k, v):
        out = _xla_attention(q, k, v, mask, scale=scale, window=window,
                             slopes=slopes)
        # zero padded-query rows: flash normalizes them arbitrarily, XLA too —
        # mask both the same way
        return jnp.sum(out * out)

    # compare value and grads on unpadded region
    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    lf, lx = loss_flash(q, k, v), loss_xla(q, k, v)
    # losses include padded-row contributions which may differ; compare grads
    # only where attention output is well-defined (valid query rows)
    valid = np.asarray(mask)[0].astype(bool)
    for a, b, name in zip(gf, gx, "qkv"):
        a, b = np.asarray(a)[0, :, :, :], np.asarray(b)[0, :, :, :]
        diff = np.abs(a - b)[:, valid if name == "q" else slice(None)]
        assert diff.max() < 5e-3, (name, diff.max())


def test_flash_forward_in_decoder_trainable():
    """End-to-end: grads flow through a flash-enabled decoder forward."""
    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.models.decoder import forward
    from sgpt_tpu.ops.pooling import weighted_mean_pool

    cfg = tiny("neo", num_layers=2, hidden_size=64, num_heads=4,
               max_position_embeddings=256).replace(use_flash=True)
    params = init_params(cfg, jax.random.key(0))
    ids = jnp.zeros((2, 128), jnp.int32)
    mask = jnp.ones((2, 128), jnp.int32)

    def loss(p):
        h = forward(p, ids, mask, cfg)
        return jnp.sum(jnp.square(weighted_mean_pool(h, mask)))

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    # grads match the XLA attention path
    cfg_xla = cfg.replace(use_flash=False)

    def loss_xla(p):
        h = forward(p, ids, mask, cfg_xla)
        return jnp.sum(jnp.square(weighted_mean_pool(h, mask)))

    gx = jax.grad(loss_xla)(params)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


@pytest.mark.parametrize("window,use_alibi,scale", [
    (0, False, 0.17677),   # global scaled
    (0, False, 1.0),       # gpt-neo unscaled
    (64, False, 0.17677),  # local window
    (0, True, 0.17677),    # alibi
])
def test_pallas_bwd_matches_scan(window, use_alibi, scale):
    """The Mosaic backward kernels == the XLA scan backward, from the SAME
    forward residuals (out, lse)."""
    from sgpt_tpu.ops.pallas.flash_attention import (
        flash_attention, flash_attention_bwd, _flash_bwd_scan)

    q, k, v, mask = _mk(seed=10 + window + int(use_alibi))
    slopes = alibi_slopes(2) if use_alibi else None
    out, lse = flash_attention(q, k, v, mask, slopes, scale=scale,
                               window=window, return_residuals=True)
    rng = np.random.default_rng(3)
    g = jnp.asarray(rng.normal(size=q.shape) * 0.5, jnp.float32)
    residuals = (q, k, v, mask, slopes, out, lse)
    want = _flash_bwd_scan(scale, window, 128, residuals, g)[:3]
    got = flash_attention_bwd(q, k, v, mask, slopes, g, out, lse,
                              scale=scale, window=window)
    for a, b, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"d{name}")


def test_pallas_bwd_fully_masked_rows_zero():
    """Leading padded keys make early causal query rows fully masked
    (lse = NEG_INF); their dq must be 0 and dk/dv on masked keys must be 0 —
    not the exp(0)=1 garbage NEG_INF - NEG_INF would produce (r2 bug class)."""
    from sgpt_tpu.ops.pallas.flash_attention import (
        flash_attention, flash_attention_bwd, _flash_bwd_scan)

    B, H, T, Dh = 1, 2, 256, 32
    rng = np.random.default_rng(5)
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, T, Dh)) * 0.3, jnp.float32)
    q, k, v = mk(), mk(), mk()
    mask = np.ones((B, T), np.int32)
    mask[0, :140] = 0                 # rows 0..139 see NO live keys (causal)
    mask = jnp.asarray(mask)
    out, lse = flash_attention(q, k, v, mask, None, scale=0.2,
                               return_residuals=True)
    g = jnp.asarray(rng.normal(size=q.shape), jnp.float32)
    dq, dk, dv = flash_attention_bwd(q, k, v, mask, None, g, out, lse,
                                     scale=0.2)
    dq, dk, dv = map(np.asarray, (dq, dk, dv))
    assert np.all(np.isfinite(dq)) and np.all(np.isfinite(dk))
    np.testing.assert_array_equal(dq[0, :, :140], 0.0)   # dead query rows
    np.testing.assert_array_equal(dk[0, :, :140], 0.0)   # masked keys
    np.testing.assert_array_equal(dv[0, :, :140], 0.0)
    want = _flash_bwd_scan(0.2, 0, 128, (q, k, v, mask, None, out, lse), g)
    for a, b, name in zip((dq, dk, dv), want, "qkv"):
        np.testing.assert_allclose(a, np.asarray(b), rtol=1e-4, atol=1e-5,
                                   err_msg=f"d{name}")


def test_pallas_bwd_uneven_blocks():
    """block_q != block_kv and T spanning multiple tiles of each."""
    from sgpt_tpu.ops.pallas.flash_attention import (
        flash_attention, flash_attention_bwd, _flash_bwd_scan)

    q, k, v, mask = _mk(T=512, seed=9)
    out, lse = flash_attention(q, k, v, mask, None, scale=0.17677, window=128,
                               block_q=128, block_kv=256,
                               return_residuals=True)
    g = jnp.asarray(np.random.default_rng(4).normal(size=q.shape), jnp.float32)
    got = flash_attention_bwd(q, k, v, mask, None, g, out, lse, scale=0.17677,
                              window=128, block_q=128, block_kv=256)
    want = _flash_bwd_scan(0.17677, 128, 256, (q, k, v, mask, None, out, lse), g)
    for a, b, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=f"d{name}")
