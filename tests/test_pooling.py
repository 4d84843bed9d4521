"""Pooling math vs the reference's torch formulas (golden-value style, SURVEY.md §4)."""
import numpy as np
import jax.numpy as jnp

from sgpt_tpu.ops import (
    mean_pool, weighted_mean_pool, learned_weighted_mean_pool, last_token_pool,
    mean_mean_pool, last_token_mean_pool, max_pool, cls_pool, normalize, pool,
)

rng = np.random.default_rng(0)
B, T, D, L = 4, 9, 8, 3
H = rng.normal(size=(B, T, D)).astype(np.float32)
STACK = rng.normal(size=(L, B, T, D)).astype(np.float32)
MASK = np.ones((B, T), dtype=np.int32)
MASK[1, 6:] = 0
MASK[2, 3:] = 0
MASK[3, 1:] = 0


def _np_weightedmean(h, m):
    w = np.arange(1, T + 1, dtype=np.float64)[None, :, None]
    mm = m[:, :, None].astype(np.float64)
    return (h * mm * w).sum(1) / (mm * w).sum(1)


def test_mean():
    got = np.asarray(mean_pool(jnp.asarray(H), jnp.asarray(MASK)))
    m = MASK[:, :, None]
    want = (H * m).sum(1) / m.sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weightedmean():
    got = np.asarray(weighted_mean_pool(jnp.asarray(H), jnp.asarray(MASK)))
    np.testing.assert_allclose(got, _np_weightedmean(H, MASK), rtol=1e-5)


def test_learned_weightedmean_matches_unit_weights():
    w = jnp.ones((T,), jnp.float32)
    got = np.asarray(learned_weighted_mean_pool(jnp.asarray(H), jnp.asarray(MASK), w))
    want = np.asarray(mean_pool(jnp.asarray(H), jnp.asarray(MASK)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_learned_weightedmean_position_weights():
    w = jnp.asarray(np.arange(1, T + 1, dtype=np.float32))
    got = np.asarray(learned_weighted_mean_pool(jnp.asarray(H), jnp.asarray(MASK), w))
    np.testing.assert_allclose(got, _np_weightedmean(H, MASK), rtol=1e-5)


def test_lasttoken():
    got = np.asarray(last_token_pool(jnp.asarray(H), jnp.asarray(MASK)))
    lengths = MASK.sum(1)
    want = np.stack([H[i, lengths[i] - 1] for i in range(B)])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_meanmean():
    got = np.asarray(mean_mean_pool(jnp.asarray(STACK), jnp.asarray(MASK)))
    m = MASK[None, :, :, None]
    want = (STACK * m).sum(axis=(0, 2)) / (L * MASK.sum(1))[:, None]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lasttokenmean():
    got = np.asarray(last_token_mean_pool(jnp.asarray(STACK), jnp.asarray(MASK)))
    lengths = MASK.sum(1)
    want = np.stack([STACK[:, i, lengths[i] - 1].mean(0) for i in range(B)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_max_cls():
    got = np.asarray(max_pool(jnp.asarray(H), jnp.asarray(MASK)))
    masked = np.where(MASK[:, :, None].astype(bool), H, -1e9)
    np.testing.assert_allclose(got, masked.max(1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(cls_pool(jnp.asarray(H), jnp.asarray(MASK))),
                               H[:, 0], rtol=1e-6)


def test_token_weighted_mean():
    from sgpt_tpu.ops.pooling import token_weighted_mean_pool
    w = np.abs(rng.normal(size=(B, T))).astype(np.float32)
    got = np.asarray(token_weighted_mean_pool(jnp.asarray(H), jnp.asarray(MASK),
                                              jnp.asarray(w)))
    m = MASK[:, :, None].astype(np.float64)
    ww = w[:, :, None]
    want = (H * ww * m).sum(1) / (m * ww).sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # unit weights == plain mean
    ones = jnp.ones((B, T), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(token_weighted_mean_pool(jnp.asarray(H), jnp.asarray(MASK), ones)),
        np.asarray(mean_pool(jnp.asarray(H), jnp.asarray(MASK))), rtol=1e-5)


def test_normalize_unit_norm():
    got = np.asarray(normalize(jnp.asarray(H[:, 0])))
    np.testing.assert_allclose(np.linalg.norm(got, axis=-1), 1.0, rtol=1e-5)


def test_pool_dispatch():
    a = np.asarray(pool("weightedmean", jnp.asarray(H), jnp.asarray(MASK)))
    b = np.asarray(weighted_mean_pool(jnp.asarray(H), jnp.asarray(MASK)))
    np.testing.assert_array_equal(a, b)


def test_bf16_accumulates_in_fp32():
    h16 = jnp.asarray(H, jnp.bfloat16)
    got = np.asarray(weighted_mean_pool(h16, jnp.asarray(MASK)).astype(jnp.float32))
    want = _np_weightedmean(H, MASK)
    assert np.abs(got - want).max() < 0.05  # bf16 input precision, fp32 accum
