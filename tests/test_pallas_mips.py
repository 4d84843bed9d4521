"""Pallas streaming MIPS kernel vs numpy brute force (interpret mode)."""
import numpy as np
import pytest

import jax.numpy as jnp

from sgpt_tpu.ops.pallas.mips import mips_topk


def _brute(q, c, k):
    scores = q @ c.T
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx


def test_mips_exact():
    rng = np.random.default_rng(0)
    Q, N, D, k = 8, 1024, 64, 10
    q = rng.normal(size=(Q, D)).astype(np.float32)
    c = rng.normal(size=(N, D)).astype(np.float32)
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(c), N, k=k, tile_n=256,
                          interpret=True)
    wv, wi = _brute(q, c, k)
    np.testing.assert_allclose(np.asarray(vals), wv, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), wi)


def test_mips_valid_count_masking():
    rng = np.random.default_rng(1)
    Q, N, D, k = 4, 512, 32, 5
    q = rng.normal(size=(Q, D)).astype(np.float32)
    c = rng.normal(size=(N, D)).astype(np.float32)
    c[400:] = 50.0  # padded region must be invisible
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(c), 400, k=k, tile_n=128,
                          interpret=True)
    assert (np.asarray(idx) < 400).all()
    wv, wi = _brute(q, c[:400], k)
    np.testing.assert_allclose(np.asarray(vals), wv, atol=1e-4)


def test_mips_single_tile_and_ties():
    rng = np.random.default_rng(2)
    Q, N, D, k = 3, 128, 16, 4
    q = rng.normal(size=(Q, D)).astype(np.float32)
    c = rng.normal(size=(N, D)).astype(np.float32)
    c[7] = c[3]  # exact tie: lowest index must win first
    vals, idx = mips_topk(jnp.asarray(q), jnp.asarray(c), N, k=k, tile_n=128,
                          interpret=True)
    wv, wi = _brute(q, c, k)
    np.testing.assert_allclose(np.asarray(vals), wv, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(idx), wi)


def test_mips_results_sorted_desc():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 8)).astype(np.float32)
    c = rng.normal(size=(256, 8)).astype(np.float32)
    vals, _ = mips_topk(jnp.asarray(q), jnp.asarray(c), 256, k=8, tile_n=64,
                        interpret=True)
    v = np.asarray(vals)
    assert (np.diff(v, axis=1) <= 1e-6).all()
