"""Ring attention over the 8-device mesh == single-device causal attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sgpt_tpu.ops.ring_attention import ring_attention


def _xla_attention(q, k, v, key_mask, scale=1.0, window=0):
    T = q.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST) * scale
    i = np.arange(T)
    mask = i[None, :] <= i[:, None]
    if window > 0:
        mask = mask & (i[None, :] > i[:, None] - window)
    mask = jnp.asarray(mask)[None, None] & key_mask[:, None, None, :].astype(bool)
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      precision=jax.lax.Precision.HIGHEST)


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()), ("dp",))


def _mk(T, seed=0, B=2, H=2, Dh=16):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(B, H, T, Dh)) * 0.5, jnp.float32)
    mask = np.ones((B, T), np.int32)
    mask[B - 1, T - T // 5:] = 0
    return mk(), mk(), mk(), jnp.asarray(mask)


def test_ring_matches_single_device(mesh):
    q, k, v, mask = _mk(T=64)
    got = ring_attention(q, k, v, mask, mesh=mesh, scale=0.25)
    want = _xla_attention(q, k, v, mask, scale=0.25)
    m = np.asarray(mask)[:, None, :, None]
    assert (np.abs(np.asarray(got) - np.asarray(want)) * m).max() < 1e-4


def test_ring_unscaled_and_window(mesh):
    q, k, v, mask = _mk(T=64, seed=1)
    got = ring_attention(q, k, v, mask, mesh=mesh, scale=1.0, window=24)
    want = _xla_attention(q, k, v, mask, scale=1.0, window=24)
    m = np.asarray(mask)[:, None, :, None]
    assert (np.abs(np.asarray(got) - np.asarray(want)) * m).max() < 1e-4


def test_ring_long_sequence_sharded(mesh):
    # sequence 8x larger than a single shard's block
    q, k, v, mask = _mk(T=256, seed=2, B=1, H=1, Dh=8)
    got = ring_attention(q, k, v, mask, mesh=mesh, scale=0.35)
    want = _xla_attention(q, k, v, mask, scale=0.35)
    m = np.asarray(mask)[:, None, :, None]
    assert (np.abs(np.asarray(got) - np.asarray(want)) * m).max() < 1e-4


def test_fully_masked_rows_output_zeros(mesh):
    """A query row with NO valid key anywhere (all-pad text) must output
    exactly zero — the pre-fix online softmax degenerated to exp(0)=1 per
    key and returned mean(V) for such rows (review finding)."""
    q, k, v, _ = _mk(16, seed=9)
    mask = np.ones((2, 16), np.int32)
    mask[1, :] = 0                       # batch row 1: every key masked
    out = ring_attention(q, k, v, jnp.asarray(mask), mesh=mesh)
    out = np.asarray(out)
    assert np.abs(out[1]).max() == 0.0, np.abs(out[1]).max()
    assert np.isfinite(out[0]).all() and np.abs(out[0]).max() > 0
