"""Flash-attention kernel vs the reference XLA attention (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.models.decoder import alibi_slopes
from sgpt_tpu.ops.pallas.flash_attention import flash_attention


def _xla_attention(q, k, v, key_mask, scale=1.0, window=0, slopes=None):
    B, H, T, Dh = q.shape
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s * scale
    i = np.arange(T)[:, None]
    j = np.arange(T)[None, :]
    mask = j <= i
    if window > 0:
        mask = mask & (j > i - window)
    mask = mask[None, None] & key_mask[:, None, None, :].astype(bool)
    if slopes is not None:
        s = s + slopes[None, :, None, None] * jnp.arange(T, dtype=jnp.float32)[None, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _mk(B=2, H=2, T=256, Dh=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
    mask = np.ones((B, T), np.int32)
    mask[1, T - 40:] = 0
    return q, k, v, jnp.asarray(mask)


def _check(got, want, mask, atol=2e-3):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    m = np.asarray(mask)[:, None, :, None]
    diff = np.abs(got - want) * m
    assert diff.max() < atol, diff.max()


def test_flash_global_causal():
    q, k, v, mask = _mk()
    got = flash_attention(q, k, v, mask, scale=0.125, interpret=True)
    want = _xla_attention(q, k, v, mask, scale=0.125)
    _check(got, want, mask)


def test_flash_unscaled_gptneo_style():
    q, k, v, mask = _mk(seed=1)
    got = flash_attention(q, k, v, mask, scale=1.0, interpret=True)
    want = _xla_attention(q, k, v, mask, scale=1.0)
    _check(got, want, mask)


def test_flash_local_window():
    q, k, v, mask = _mk(seed=2)
    got = flash_attention(q, k, v, mask, scale=0.125, window=64, interpret=True)
    want = _xla_attention(q, k, v, mask, scale=0.125, window=64)
    _check(got, want, mask)


def test_flash_alibi():
    q, k, v, mask = _mk(seed=3)
    slopes = alibi_slopes(2)
    got = flash_attention(q, k, v, mask, alibi_slopes=slopes, scale=0.125,
                          interpret=True)
    want = _xla_attention(q, k, v, mask, scale=0.125, slopes=slopes)
    _check(got, want, mask)


def test_flash_uneven_blocks():
    q, k, v, mask = _mk(T=384)
    got = flash_attention(q, k, v, mask, scale=0.125, block_q=128, block_kv=128,
                          interpret=True)
    want = _xla_attention(q, k, v, mask, scale=0.125)
    _check(got, want, mask)


def test_flash_bf16():
    q, k, v, mask = _mk()
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    got = flash_attention(q, k, v, mask, scale=0.125, interpret=True)
    want = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                          v.astype(jnp.float32), mask, scale=0.125)
    _check(got, want, mask, atol=0.05)
