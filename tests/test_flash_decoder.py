"""Decoder forward with the flash kernel == XLA attention path, all families."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.models.decoder import forward


@pytest.mark.parametrize("family", ["neo", "gptj", "bloom"])
def test_flash_forward_matches_xla(family):
    cfg = tiny(family, num_layers=2, hidden_size=64, num_heads=4,
               max_position_embeddings=256)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    B, T = 2, 128
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, 100:] = 0
    mask = jnp.asarray(mask)

    want = np.asarray(forward(params, ids, mask, cfg))
    got = np.asarray(forward(params, ids, mask, cfg.replace(use_flash=True)))
    m = np.asarray(mask)[:, :, None]
    assert (np.abs(got - want) * m).max() < 2e-4


def test_flash_falls_back_on_unaligned_T():
    cfg = tiny("neo").replace(use_flash=True)
    params = init_params(cfg, jax.random.key(0))
    ids = jnp.zeros((2, 17), jnp.int32)   # 17 % 128 != 0 → XLA path
    mask = jnp.ones((2, 17), jnp.int32)
    out = forward(params, ids, mask, cfg)
    assert out.shape == (2, 17, cfg.hidden_size)
