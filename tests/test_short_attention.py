"""Fused short-T attention kernel == XLA attention path, all families."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.models.decoder import forward
from sgpt_tpu.ops.pallas.short_attention import _reference_hd, short_attention


@pytest.mark.parametrize("family", ["neo", "gptj", "bloom"])
def test_fused_forward_matches_xla(family):
    """Full decoder forward with fused_attention == the XLA attention path.
    Covers rope (gptj), alibi (bloom), local/global alternation (neo)."""
    cfg = tiny(family, num_layers=2, hidden_size=64, num_heads=4,
               max_position_embeddings=256)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    B, T = 2, 176  # within the fused window (160 <= T <= 512)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, 160:] = 0
    mask = jnp.asarray(mask)

    want = np.asarray(forward(params, ids, mask, cfg))
    got = np.asarray(forward(params, ids, mask,
                             cfg.replace(fused_attention=True)))
    m = np.asarray(mask)[:, :, None]
    assert (np.abs(got - want) * m).max() < 2e-4


def test_fused_kernel_matches_reference_variants():
    rng = np.random.default_rng(1)
    B, T, H, Dh = 2, 40, 4, 16
    km = np.ones((B, T), np.int32)
    km[1, 30:] = 0
    km = jnp.asarray(km)
    for scale, window, alibi in ((1.0, 0, False), (0.25, 0, False),
                                 (1.0, 16, False), (1.0, 0, True)):
        q2 = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
        k2 = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
        v2 = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
        slopes = (jnp.asarray(rng.random(H), jnp.float32) if alibi
                  else jnp.zeros((H,), jnp.float32))
        got = short_attention(q2, k2, v2, km, slopes, scale, window, H, alibi)
        want = _reference_hd(q2, k2, v2, km, slopes, scale=scale,
                             window=window, H=H, use_alibi=alibi)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_fused_gradients_match_reference():
    """custom-VJP backward (XLA recompute) == differentiating the reference."""
    rng = np.random.default_rng(2)
    B, T, H, Dh = 2, 24, 2, 8
    km = jnp.ones((B, T), jnp.int32)
    slopes = jnp.zeros((H,), jnp.float32)
    q2, k2, v2 = (jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
                  for _ in range(3))

    def f(a, b, c):
        return jnp.sum(short_attention(a, b, c, km, slopes, 0.5, 0, H, False) ** 2)

    def fr(a, b, c):
        return jnp.sum(_reference_hd(a, b, c, km, slopes, scale=0.5, window=0,
                                     H=H, use_alibi=False) ** 2)

    g = jax.grad(f, argnums=(0, 1, 2))(q2, k2, v2)
    gr = jax.grad(fr, argnums=(0, 1, 2))(q2, k2, v2)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_trainer_step_runs():
    """BitFit training through the fused forward (custom-VJP path)."""
    from sgpt_tpu.tokenization import SimpleTokenizer
    from sgpt_tpu.training import ContrastiveTrainer, TrainConfig

    cfg = tiny("neo", num_layers=1, hidden_size=32, num_heads=2,
               vocab_size=256,
               max_position_embeddings=192).replace(fused_attention=True)
    trainer = ContrastiveTrainer(
        init_params(cfg, jax.random.key(0)), cfg,
        SimpleTokenizer(vocab_size=256),
        # trainer pads to max_seq_len, so T=176 keeps the fused custom-VJP
        # path active (fused window is 160 <= T <= 512)
        TrainConfig(batch_size=4, max_seq_len=176, lr=1e-3,
                    freeze_nonbias=True))
    batch = [(f"a {i}", f"p {i}") for i in range(4)]
    out = trainer.fit(lambda: iter([batch, batch]), steps_per_epoch=2)
    losses = [h["loss"] for h in out["history"] if "loss" in h]
    assert len(losses) == 2 and all(np.isfinite(losses))


def test_vmem_gates():
    """Calibration points: 125M (HD=768) fits at every fused-window T;
    GPT-J width (HD=4096) does not (measured Mosaic allocation: 19.04 MB
    requested vs the 16 MB limit at T=304) — the decoder must route wide
    models to the XLA path instead of failing kernel compilation."""
    from sgpt_tpu.ops.pallas.short_attention import (_bwd_fits_vmem,
                                                     fwd_fits_vmem)

    assert fwd_fits_vmem(304, 768, 2) and fwd_fits_vmem(512, 768, 2)
    assert _bwd_fits_vmem(304, 768, 2) and _bwd_fits_vmem(512, 768, 2)
    assert not fwd_fits_vmem(304, 4096, 2)       # GPT-J: observed OOM
    assert not _bwd_fits_vmem(512, 2560, 2)      # 2.7B-dim backward at cap

    # decoder gate: a wide config with the flag on still works (XLA path)
    cfg = tiny("gptj", num_layers=1, num_heads=2, hidden_size=4096,
               max_position_embeddings=256).replace(fused_attention=True)
    params = init_params(cfg, jax.random.key(0))
    ids = jnp.zeros((1, 176), jnp.int32)
    out = forward(params, ids, jnp.ones_like(ids), cfg)
    assert out.shape == (1, 176, cfg.hidden_size)


def test_fused_falls_back_on_long_T():
    cfg = tiny("neo", max_position_embeddings=1024).replace(fused_attention=True)
    params = init_params(cfg, jax.random.key(0))
    ids = jnp.zeros((1, 640), jnp.int32)   # > 512 cap -> XLA path
    out = forward(params, ids, jnp.ones_like(ids), cfg)
    assert out.shape == (1, 640, cfg.hidden_size)


def test_pallas_backward_kernel_matches_reference_vjp():
    """The Pallas backward kernel (_bwd_kernel, TPU path of the custom VJP)
    == differentiating the XLA reference, across scale/window/alibi/padding."""
    from sgpt_tpu.ops.pallas.short_attention import _short_attention_bwd_impl

    rng = np.random.default_rng(3)
    B, T, H, Dh = 2, 40, 4, 16
    km = np.ones((B, T), np.int32)
    km[1, 30:] = 0
    km = jnp.asarray(km)
    for scale, window, alibi in ((1.0, 0, False), (0.25, 0, False),
                                 (1.0, 16, False), (1.0, 0, True)):
        q2, k2, v2, g = (jnp.asarray(rng.normal(size=(B, T, H * Dh)),
                                     jnp.float32) for _ in range(4))
        slopes = (jnp.asarray(rng.random(H), jnp.float32) if alibi
                  else jnp.zeros((H,), jnp.float32))

        def f(q2_, k2_, v2_):
            return _reference_hd(q2_, k2_, v2_, km, slopes, scale=scale,
                                 window=window, H=H, use_alibi=alibi)

        _, vjp = jax.vjp(f, q2, k2, v2)
        want = vjp(g)
        from sgpt_tpu.ops.pallas.short_attention import _seg_kpos_blocks
        seg, kp = _seg_kpos_blocks(km, None, None, B, T)
        got = _short_attention_bwd_impl(q2, k2, v2, km, slopes, seg, kp, g,
                                        scale, window, H, alibi, False,
                                        interpret=True)
        for gw, gg in zip(want, got):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                       atol=2e-5, rtol=1e-4)


def test_pallas_backward_fully_masked_rows():
    """Padded query rows past a local window see NO valid keys: their softmax
    is uniform (1/T), and the XLA where-VJP zeroes their score cotangent.
    Regression: the kernel must re-mask dS or those rows leak nonzero dq and
    corrupt dk at valid key rows (found by review; T=60/window=16/pad@30
    makes rows >= 46 fully masked)."""
    from sgpt_tpu.ops.pallas.short_attention import _short_attention_bwd_impl

    rng = np.random.default_rng(4)
    B, T, H, Dh = 2, 60, 2, 16
    window = 16
    km = np.ones((B, T), np.int32)
    km[1, 30:] = 0                      # rows 46.. of batch 1: fully masked
    km = jnp.asarray(km)
    q2, k2, v2, g = (jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
                     for _ in range(4))
    slopes = jnp.zeros((H,), jnp.float32)

    def f(q2_, k2_, v2_):
        return _reference_hd(q2_, k2_, v2_, km, slopes, scale=1.0,
                             window=window, H=H, use_alibi=False)

    _, vjp = jax.vjp(f, q2, k2, v2)
    want = vjp(g)
    from sgpt_tpu.ops.pallas.short_attention import _seg_kpos_blocks
    seg, kp = _seg_kpos_blocks(km, None, None, B, T)
    got = _short_attention_bwd_impl(q2, k2, v2, km, slopes, seg, kp, g,
                                    1.0, window, H, False, False,
                                    interpret=True)
    for gw, gg in zip(want, got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=2e-5, rtol=1e-4)
    # and dq at the fully-masked rows is exactly zero
    assert np.abs(np.asarray(got[0])[1, 46:]).max() == 0.0


# ---------------------------------------------------------------------------
# round-5: block-diagonal segment masks in the fused kernel (CE packing)
# ---------------------------------------------------------------------------

def _packed_fixture(rng, B, T, H, Dh, n_seg=3):
    """Rows split into contiguous segments with a padded tail."""
    seg = np.zeros((B, T), np.int32)
    km = np.ones((B, T), np.int32)
    bounds = sorted(rng.choice(np.arange(4, T - 4), size=n_seg - 1,
                               replace=False))
    for i, b in enumerate(bounds):
        seg[:, b:] = i + 1
    km[:, T - 6:] = 0                         # padded tail
    pos = np.zeros((B, T), np.int32)
    prev = 0
    for b in list(bounds) + [T]:
        pos[:, prev:b] = np.arange(b - prev)
        prev = b
    q2, k2, v2 = (jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
                  for _ in range(3))
    return (jnp.asarray(seg), jnp.asarray(km), jnp.asarray(pos), q2, k2, v2)


@pytest.mark.parametrize("alibi", [False, True])
def test_fused_kernel_segment_mask_matches_reference(alibi):
    rng = np.random.default_rng(5)
    B, T, H, Dh = 2, 48, 4, 16
    seg, km, pos, q2, k2, v2 = _packed_fixture(rng, B, T, H, Dh)
    slopes = (jnp.asarray(rng.random(H), jnp.float32) if alibi
              else jnp.zeros((H,), jnp.float32))
    got = short_attention(q2, k2, v2, km, slopes, 0.25, 0, H, alibi,
                          segments=seg, positions=pos if alibi else None)
    want = _reference_hd(q2, k2, v2, km, slopes, scale=0.25, window=0, H=H,
                         use_alibi=alibi, segments=seg,
                         positions=pos if alibi else None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_kernel_segment_equals_standalone_rows():
    """Two texts packed into one row == the same texts in separate rows."""
    rng = np.random.default_rng(6)
    H, Dh = 2, 16
    Ta, Tb = 20, 12
    qa, ka, va = (jnp.asarray(rng.normal(size=(1, Ta, H * Dh)), jnp.float32)
                  for _ in range(3))
    qb, kb, vb = (jnp.asarray(rng.normal(size=(1, Tb, H * Dh)), jnp.float32)
                  for _ in range(3))
    # standalone
    oa = short_attention(qa, ka, va, jnp.ones((1, Ta), jnp.int32),
                         jnp.zeros((H,), jnp.float32), 1.0, 0, H, False)
    ob = short_attention(qb, kb, vb, jnp.ones((1, Tb), jnp.int32),
                         jnp.zeros((H,), jnp.float32), 1.0, 0, H, False)
    # packed into one row
    T = Ta + Tb
    qp = jnp.concatenate([qa, qb], axis=1)
    kp = jnp.concatenate([ka, kb], axis=1)
    vp = jnp.concatenate([va, vb], axis=1)
    seg = jnp.asarray(np.r_[np.zeros(Ta), np.ones(Tb)][None].astype(np.int32))
    km = jnp.ones((1, T), jnp.int32)
    op = short_attention(qp, kp, vp, km, jnp.zeros((H,), jnp.float32),
                         1.0, 0, H, False, segments=seg)
    np.testing.assert_allclose(np.asarray(op[:, :Ta]), np.asarray(oa),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(op[:, Ta:]), np.asarray(ob),
                               atol=1e-5)


def test_fused_segment_gradients_match_reference():
    """Packed custom-VJP (Pallas backward in interpret mode on CPU) ==
    differentiating the XLA reference with the same block-diagonal mask."""
    from sgpt_tpu.ops.pallas.short_attention import (_seg_kpos_blocks,
                                                     _short_attention_bwd_impl)
    rng = np.random.default_rng(7)
    B, T, H, Dh = 2, 40, 2, 16
    seg, km, pos, q2, k2, v2 = _packed_fixture(rng, B, T, H, Dh)
    g = jnp.asarray(rng.normal(size=(B, T, H * Dh)), jnp.float32)
    slopes = jnp.zeros((H,), jnp.float32)

    def f(q2_, k2_, v2_):
        return _reference_hd(q2_, k2_, v2_, km, slopes, scale=0.5, window=0,
                             H=H, use_alibi=False, segments=seg)

    _, vjp = jax.vjp(f, q2, k2, v2)
    want = vjp(g)
    sb, kb = _seg_kpos_blocks(km, seg, pos, B, T)
    got = _short_attention_bwd_impl(q2, k2, v2, km, slopes, sb, kb, g,
                                    0.5, 0, H, False, True, interpret=True)
    for gw, gg in zip(want, got):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(gw),
                                   atol=2e-5, rtol=1e-4)


def test_decoder_packed_rows_keep_fused_path():
    """Full decoder: packed forward with fused_attention == the XLA path
    (and both == each segment encoded standalone, via the existing
    test_ce_packing decoder-level equality — here we pin fused==XLA)."""
    cfg = tiny("neo", num_layers=2, hidden_size=64, num_heads=4,
               max_position_embeddings=256)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(8)
    B, T = 2, 176                      # inside the fused window
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    seg = np.zeros((B, T), np.int32)
    seg[:, 90:] = 1
    pos = np.concatenate([np.arange(90), np.arange(T - 90)])[None].repeat(
        B, axis=0).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, 168:] = 0
    seg, pos, mask = jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(mask)

    want = np.asarray(forward(params, ids, mask, cfg,
                              segment_ids=seg, position_ids=pos))
    got = np.asarray(forward(params, ids, mask,
                             cfg.replace(fused_attention=True),
                             segment_ids=seg, position_ids=pos))
    m = np.asarray(mask)[:, :, None]
    assert (np.abs(got - want) * m).max() < 2e-4


def test_decoder_packed_fused_alibi_matches_xla():
    """BLOOM family packed: the kernel's per-segment ALiBi key positions must
    match the XLA path's position-aware alibi bias."""
    cfg = tiny("bloom", num_layers=2, hidden_size=64, num_heads=4,
               max_position_embeddings=256)
    params = init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(9)
    B, T = 2, 176
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    seg = np.zeros((B, T), np.int32)
    seg[:, 100:] = 1
    pos = np.concatenate([np.arange(100), np.arange(T - 100)])[None].repeat(
        B, axis=0).astype(np.int32)
    mask = np.ones((B, T), np.int32)
    mask[0, 170:] = 0
    seg, pos, mask = jnp.asarray(seg), jnp.asarray(pos), jnp.asarray(mask)

    want = np.asarray(forward(params, ids, mask, cfg,
                              segment_ids=seg, position_ids=pos))
    got = np.asarray(forward(params, ids, mask,
                             cfg.replace(fused_attention=True),
                             segment_ids=seg, position_ids=pos))
    m = np.asarray(mask)[:, :, None]
    assert (np.abs(got - want) * m).max() < 2e-4
