"""Sequence-parallel decoder forward (ring attention) == plain forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.models.decoder import forward


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()), ("dp",))


@pytest.mark.parametrize("family", ["neo", "gptj", "bloom"])
def test_sp_forward_matches_plain(mesh, family):
    cfg = tiny(family, num_layers=2, hidden_size=32, num_heads=4,
               max_position_embeddings=128)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    B, T = 2, 64  # 8 tokens per shard on the 8-device mesh
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, 50:] = 0
    mask = jnp.asarray(mask)

    want = np.asarray(forward(params, ids, mask, cfg))
    got = np.asarray(forward(params, ids, mask, cfg, sp_mesh=mesh))
    m = np.asarray(mask)[:, :, None]
    assert (np.abs(got - want) * m).max() < 2e-4, (np.abs(got - want) * m).max()


def test_sp_forward_with_sharded_inputs(mesh):
    """Inputs pre-sharded over the sequence axis also work (serving layout)."""
    cfg = tiny("neo", num_layers=2, hidden_size=32, num_heads=4,
               max_position_embeddings=128)
    params = init_params(cfg, jax.random.key(1))
    ids = jnp.zeros((1, 64), jnp.int32)
    mask = jnp.ones((1, 64), jnp.int32)
    sh = NamedSharding(mesh, P(None, "dp"))
    ids_s = jax.device_put(ids, sh)
    mask_s = jax.device_put(mask, sh)
    got = np.asarray(forward(params, ids_s, mask_s, cfg, sp_mesh=mesh))
    want = np.asarray(forward(params, ids, mask, cfg))
    np.testing.assert_allclose(got, want, atol=2e-4)
