"""MNRL loss math + distributed equivalence on the virtual 8-device mesh."""
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from sgpt_tpu.losses import mnrl_loss, mnrl_loss_dp

rng = np.random.default_rng(0)
N, D = 16, 8
A = rng.normal(size=(N, D)).astype(np.float32)
B = rng.normal(size=(N, D)).astype(np.float32)
NEG = rng.normal(size=(N, D)).astype(np.float32)


def _np_mnrl(a, cands, scale=20.0):
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    cn = cands / np.linalg.norm(cands, axis=1, keepdims=True)
    s = an @ cn.T * scale
    s = s - s.max(1, keepdims=True)
    logp = s - np.log(np.exp(s).sum(1, keepdims=True))
    return -np.mean([logp[i, i] for i in range(len(a))])


def test_mnrl_matches_numpy():
    got = float(mnrl_loss(jnp.asarray(A), jnp.asarray(B)))
    assert abs(got - _np_mnrl(A, B)) < 1e-5


def test_mnrl_with_hard_negatives():
    got = float(mnrl_loss(jnp.asarray(A), jnp.asarray(B), jnp.asarray(NEG)))
    want = _np_mnrl(A, np.concatenate([B, NEG]))
    assert abs(got - want) < 1e-5


def test_mnrl_identity_is_low_loss():
    # anchors == positives ⇒ diagonal dominates ⇒ tiny loss
    loss = float(mnrl_loss(jnp.asarray(A), jnp.asarray(A)))
    assert loss < 0.01


def test_mnrl_dp_equals_global():
    """shard_map per-device loss with all-gathered candidates == global loss
    (the reference's distributed branch vs single-process branch must agree)."""
    ndev = jax.device_count()
    assert ndev == 8, "conftest should provide 8 virtual devices"
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))

    fn = jax.jit(jax.shard_map(
        partial(mnrl_loss_dp, axis_name="dp"),
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp")),
        out_specs=P()))
    got = float(fn(jnp.asarray(A), jnp.asarray(B), jnp.asarray(NEG)))
    want = float(mnrl_loss(jnp.asarray(A), jnp.asarray(B), jnp.asarray(NEG)))
    assert abs(got - want) < 1e-5


def test_mnrl_dp_gradients_equal_global():
    ndev = jax.device_count()
    mesh = Mesh(np.asarray(jax.devices()), ("dp",))
    sharded = jax.jit(jax.shard_map(
        partial(mnrl_loss_dp, axis_name="dp"),
        mesh=mesh, in_specs=(P("dp"), P("dp")), out_specs=P()))
    g_dp = jax.grad(lambda a, b: sharded(a, b))(jnp.asarray(A), jnp.asarray(B))
    g_global = jax.grad(lambda a, b: mnrl_loss(a, b))(jnp.asarray(A), jnp.asarray(B))
    np.testing.assert_allclose(np.asarray(g_dp), np.asarray(g_global), atol=1e-6)
