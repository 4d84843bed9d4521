"""Fused causal attention (flash-attention) Pallas TPU kernel.

One kernel covers the three SGPT model families' attention variants:
  * optional score scaling (GPT-Neo uses NONE — cfg.scale_attn=False)
  * sliding-window (local) causal masking (GPT-Neo odd layers, window 256)
  * ALiBi bias slope_h * key_position (BLOOM)
  * key padding mask

Never materializes the (T, T) score matrix: online-softmax over KV tiles with
fp32 running max/sum/accumulator in VMEM scratch (the standard flash recipe,
mapped to the TPU grid: (batch, heads, q-tiles) parallel × kv-tiles arbitrary).
Out-of-causal-range KV tiles are skipped with @pl.when.

Differentiable: `flash_attention_trainable` wraps the kernel in a custom VJP
(blockwise-scan backward) and decoder.py routes training through it whenever
cfg.use_flash and T % 128 == 0.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(keymask_ref, slopes_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                  m_scr, l_scr, acc_scr, *,
                  scale: float, window: int, block_q: int, block_kv: int,
                  use_alibi: bool):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q_start = qi * block_q
    k_start = ki * block_kv

    # Tile-level causal/window pruning: any (q,k) pair in range?
    causal_hit = k_start <= q_start + block_q - 1
    if window > 0:
        run = jnp.logical_and(causal_hit,
                              (k_start + block_kv - 1) > (q_start - window))
    else:
        run = causal_hit

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0]                       # (block_q, Dh)
        k = k_ref[0, 0]                       # (block_kv, Dh)
        v = v_ref[0, 0]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # (bq, bkv)
        if scale != 1.0:
            s = s * scale

        qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
        kpos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
        mask = kpos <= qpos
        if window > 0:
            mask = jnp.logical_and(mask, kpos > qpos - window)
        keymask = keymask_ref[b, :].astype(jnp.bool_)[None, :]  # (1, bkv)
        mask = jnp.logical_and(mask, keymask)

        if use_alibi:
            # right-padding invariant: padded keys are masked anyway, so the raw
            # key index equals BLOOM's (cumsum(mask)-1) position on live keys
            slope = slopes_ref[0, h]
            s = s + slope * kpos.astype(jnp.float32)

        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_scr[:]                                   # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                              # (bq, bkv)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new

    # finalize at the last kv tile that can contain in-range keys for this q tile
    last_ki = jnp.minimum(n_kv - 1, (q_start + block_q - 1) // block_kv)

    @pl.when(ki == last_ki)
    def _finalize():
        l = l_scr[:]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked (padded) query rows
        o_ref[0, 0] = (acc_scr[:] / l).astype(o_ref.dtype)
        # logsumexp per query row (the flash-backward residual)
        lse_ref[0, 0, :, 0] = (m_scr[:, 0] + jnp.log(l[:, 0]))


@functools.partial(
    jax.jit,
    static_argnames=("scale", "window", "block_q", "block_kv", "interpret",
                     "return_residuals"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    key_mask: jax.Array,
                    alibi_slopes: Optional[jax.Array] = None, *,
                    scale: float = 1.0, window: int = 0,
                    block_q: int = 128, block_kv: int = 128,
                    interpret: Optional[bool] = None,
                    return_residuals: bool = False) -> jax.Array:
    """Causal attention.

    q, k, v:   (B, H, T, Dh) — T must divide by block sizes
    key_mask:  (B, T) 1 = attend, 0 = padding
    alibi_slopes: optional (H,) fp32 — adds slope*key_index (BLOOM)
    scale:     score multiplier (1.0 = GPT-Neo unscaled; 1/sqrt(Dh) otherwise)
    window:    0 = global causal; >0 = sliding window (key > query - window)
    Returns (B, H, T, Dh) in q.dtype.
    """
    if interpret is None:  # Mosaic only exists on TPU; interpret elsewhere (tests)
        interpret = jax.default_backend() != "tpu"
    B, H, T, Dh = q.shape
    block_q = min(block_q, T)
    block_kv = min(block_kv, T)
    assert T % block_q == 0 and T % block_kv == 0, (T, block_q, block_kv)
    n_q, n_kv = T // block_q, T // block_kv

    if alibi_slopes is None:
        slopes = jnp.zeros((H,), jnp.float32)
        use_alibi = False
    else:
        slopes = alibi_slopes.astype(jnp.float32)
        use_alibi = True

    kernel = functools.partial(
        _flash_kernel, scale=scale, window=window if window > 0 else 0,
        block_q=block_q, block_kv=block_kv, use_alibi=use_alibi)

    grid = (B, H, n_q, n_kv)
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"))
    except TypeError:  # older/newer param surface
        compiler_params = None

    result = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # TPU tiling wants full leading dims on small arrays; index rows by
            # program_id inside the kernel instead
            pl.BlockSpec((B, block_kv), lambda b, h, qi, ki: (0, ki)),      # key_mask
            pl.BlockSpec((1, H), lambda b, h, qi, ki: (0, 0)),              # slopes
            pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_kv, Dh), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_kv, Dh), lambda b, h, qi, ki: (b, h, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi, ki: (b, h, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),    # running max
            pltpu.VMEM((block_q, 1), jnp.float32),    # running sum
            pltpu.VMEM((block_q, Dh), jnp.float32),   # output accumulator
        ],
        **({"compiler_params": compiler_params} if compiler_params else {}),
        interpret=interpret,
    )(key_mask.astype(jnp.int32), slopes[None, :], q, k, v)
    out, lse = result
    if return_residuals:
        return out, lse[..., 0]
    return out


# ---------------------------------------------------------------------------
# Trainable flash attention: Pallas forward + Pallas backward (TPU) with a
# blockwise-scan XLA fallback (other backends).
#
# The backward is the standard flash recipe: recompute P per (q, kv) tile pair
# from the saved logsumexp; D = rowsum(dO ∘ O); dS = P ∘ (dP − D). Two Mosaic
# kernels split the accumulation so each owns one output and keeps its
# accumulator in VMEM scratch:
#   * dq kernel:    grid (B, H, n_q, n_kv) — same shape as the forward, dq
#                   accumulates over KV tiles, causal/window tile pruning;
#   * dk/dv kernel: grid (B, H, n_kv, n_q) — dk and dv accumulate over Q
#                   tiles, pruning mirrored (q tiles strictly before the kv
#                   tile's causal range are skipped).
# Fully-masked (padded) query rows carry lse = NEG_INF from the forward;
# p = where(mask, exp(s - lse), 0) keeps the where OUTSIDE the exp result so
# the exp(0)=1 that NEG_INF-NEG_INF would produce never reaches the matmuls
# (the r2 dead-row bug class; tests/test_flash_backward.py pins it).
# ---------------------------------------------------------------------------


def _bwd_tile_common(q, k, g, lse_t, D_t, slopes_ref, h, q_start, k_start,
                     keymask_ref, b, *, scale, window, block_q, block_kv,
                     use_alibi):
    """Shared per-tile recompute: returns (p, ds) both (block_q, block_kv)."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if scale != 1.0:
        s = s * scale
    qpos = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
    kpos = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
    mask = kpos <= qpos
    if window > 0:
        mask = jnp.logical_and(mask, kpos > qpos - window)
    keymask = keymask_ref[b, :].astype(jnp.bool_)[None, :]
    mask = jnp.logical_and(mask, keymask)
    if use_alibi:
        s = s + slopes_ref[0, h] * kpos.astype(jnp.float32)
    p = jnp.where(mask, jnp.exp(s - lse_t), 0.0)
    return p, mask


def _flash_bwd_dq_kernel(keymask_ref, slopes_ref, q_ref, k_ref, v_ref, g_ref,
                         lse_ref, D_ref, dq_ref, dq_scr, *,
                         scale, window, block_q, block_kv, use_alibi):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ki == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    q_start = qi * block_q
    k_start = ki * block_kv
    run = k_start <= q_start + block_q - 1
    if window > 0:
        run = jnp.logical_and(run, (k_start + block_kv - 1) > (q_start - window))

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        g = g_ref[0, 0].astype(jnp.float32)
        lse_t = lse_ref[0, 0]                               # (block_q, 1)
        D_t = D_ref[0, 0]                                   # (block_q, 1)
        p, _ = _bwd_tile_common(q, k, g, lse_t, D_t, slopes_ref, h, q_start,
                                k_start, keymask_ref, b, scale=scale,
                                window=window, block_q=block_q,
                                block_kv=block_kv, use_alibi=use_alibi)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - D_t)
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    last_ki = jnp.minimum(n_kv - 1, (q_start + block_q - 1) // block_kv)

    @pl.when(ki == last_ki)
    def _finalize():
        dq_ref[0, 0] = dq_scr[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(keymask_ref, slopes_ref, q_ref, k_ref, v_ref, g_ref,
                          lse_ref, D_ref, dk_ref, dv_ref, dk_scr, dv_scr, *,
                          scale, window, block_q, block_kv, use_alibi):
    b = pl.program_id(0)
    h = pl.program_id(1)
    ki = pl.program_id(2)
    qi = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q_start = qi * block_q
    k_start = ki * block_kv
    # mirror of the dq pruning: this q tile sees the kv tile iff its last row
    # is causally >= the tile start, and (window) its first row is in range
    run = q_start + block_q - 1 >= k_start
    if window > 0:
        run = jnp.logical_and(run, q_start < k_start + block_kv - 1 + window)
        last_qi = jnp.minimum(n_q - 1,
                              (k_start + block_kv - 2 + window) // block_q)
    else:
        last_qi = n_q - 1

    @pl.when(run)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)
        k = k_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        g = g_ref[0, 0].astype(jnp.float32)
        lse_t = lse_ref[0, 0]
        D_t = D_ref[0, 0]
        p, _ = _bwd_tile_common(q, k, g, lse_t, D_t, slopes_ref, h, q_start,
                                k_start, keymask_ref, b, scale=scale,
                                window=window, block_q=block_q,
                                block_kv=block_kv, use_alibi=use_alibi)
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p, g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (bkv, Dh)
        dp = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - D_t)
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    @pl.when(qi == last_qi)
    def _finalize():
        dk_ref[0, 0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "window", "block_q", "block_kv", "interpret"))
def flash_attention_bwd(q, k, v, key_mask, alibi_slopes, g, out, lse, *,
                        scale: float = 1.0, window: int = 0,
                        block_q: int = 128, block_kv: int = 128,
                        interpret: Optional[bool] = None):
    """Pallas flash backward: (dq, dk, dv) in q/k/v dtypes.

    g: cotangent of the output (B, H, T, Dh); out/lse: forward residuals.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, T, Dh = q.shape
    block_q = min(block_q, T)
    block_kv = min(block_kv, T)
    assert T % block_q == 0 and T % block_kv == 0, (T, block_q, block_kv)
    n_q, n_kv = T // block_q, T // block_kv

    if alibi_slopes is None:
        slopes = jnp.zeros((H,), jnp.float32)
        use_alibi = False
    else:
        slopes = alibi_slopes.astype(jnp.float32)
        use_alibi = True

    D = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                axis=-1, keepdims=True)                     # (B, H, T, 1)
    lse4 = lse[..., None] if lse.ndim == 3 else lse         # (B, H, T, 1)

    common = dict(scale=scale, window=window if window > 0 else 0,
                  block_q=block_q, block_kv=block_kv, use_alibi=use_alibi)
    try:
        cp = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"))
    except TypeError:
        cp = None
    cp_kw = {"compiler_params": cp} if cp else {}
    km = key_mask.astype(jnp.int32)

    def qspec(idx):
        return pl.BlockSpec((1, 1, block_q, Dh), idx)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **common),
        grid=(B, H, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((B, block_kv), lambda b, h, qi, ki: (0, ki)),
            pl.BlockSpec((1, H), lambda b, h, qi, ki: (0, 0)),
            qspec(lambda b, h, qi, ki: (b, h, qi, 0)),                   # q
            pl.BlockSpec((1, 1, block_kv, Dh), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_kv, Dh), lambda b, h, qi, ki: (b, h, ki, 0)),
            qspec(lambda b, h, qi, ki: (b, h, qi, 0)),                   # g
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, qi, ki: (b, h, qi, 0)),
        ],
        out_specs=qspec(lambda b, h, qi, ki: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, Dh), jnp.float32)],
        **cp_kw, interpret=interpret,
    )(km, slopes[None, :], q, k, v, g, lse4, D)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **common),
        grid=(B, H, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((B, block_kv), lambda b, h, ki, qi: (0, ki)),
            pl.BlockSpec((1, H), lambda b, h, ki, qi: (0, 0)),
            qspec(lambda b, h, ki, qi: (b, h, qi, 0)),                   # q
            pl.BlockSpec((1, 1, block_kv, Dh), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_kv, Dh), lambda b, h, ki, qi: (b, h, ki, 0)),
            qspec(lambda b, h, ki, qi: (b, h, qi, 0)),                   # g
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, ki, qi: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda b, h, ki, qi: (b, h, qi, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_kv, Dh), lambda b, h, ki, qi: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_kv, Dh), lambda b, h, ki, qi: (b, h, ki, 0)),
        ),
        out_shape=(jax.ShapeDtypeStruct((B, H, T, Dh), k.dtype),
                   jax.ShapeDtypeStruct((B, H, T, Dh), v.dtype)),
        scratch_shapes=[pltpu.VMEM((block_kv, Dh), jnp.float32),
                        pltpu.VMEM((block_kv, Dh), jnp.float32)],
        **cp_kw, interpret=interpret,
    )(km, slopes[None, :], q, k, v, g, lse4, D)
    return dq, dk, dv

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def flash_attention_trainable(q, k, v, key_mask, alibi_slopes,
                              scale: float = 1.0, window: int = 0,
                              block_kv: int = 128):
    """Differentiable causal flash attention. Args as flash_attention;
    alibi_slopes must be an (H,) array or None (no grad either way)."""
    return flash_attention(q, k, v, key_mask, alibi_slopes,
                           scale=scale, window=window, block_kv=block_kv)


def _flash_fwd(q, k, v, key_mask, alibi_slopes, scale, window, block_kv):
    out, lse = flash_attention(q, k, v, key_mask, alibi_slopes, scale=scale,
                               window=window, block_kv=block_kv,
                               return_residuals=True)
    return out, (q, k, v, key_mask, alibi_slopes, out, lse)


def _flash_bwd(scale, window, block_kv, residuals, g):
    q, k, v, key_mask, alibi_slopes, out, lse = residuals
    if jax.default_backend() == "tpu":
        # Mosaic backward: tiled recompute entirely in VMEM (the forward's
        # memory/time profile carries to the grad step; measured vs the scan
        # fallback in docs/PERF.md)
        dq, dk, dv = flash_attention_bwd(q, k, v, key_mask, alibi_slopes, g,
                                         out, lse, scale=scale, window=window,
                                         block_kv=block_kv)
        return dq, dk, dv, None, None
    return _flash_bwd_scan(scale, window, block_kv, residuals, g)


def _flash_bwd_scan(scale, window, block_kv, residuals, g):
    """XLA lax.scan backward — the non-TPU fallback (and the parity oracle
    the Pallas backward is tested against)."""
    q, k, v, key_mask, alibi_slopes, out, lse = residuals
    B, H, T, Dh = q.shape
    bkv = min(block_kv, T)
    n_kv = T // bkv
    f32 = jnp.float32

    qf = q.astype(f32)
    gf = g.astype(f32)
    # D_i = sum_j dO_ij * O_ij  (B, H, T)
    D = jnp.sum(gf * out.astype(f32), axis=-1)

    qpos = jnp.arange(T)
    k_tiles = k.reshape(B, H, n_kv, bkv, Dh).astype(f32)
    v_tiles = v.reshape(B, H, n_kv, bkv, Dh).astype(f32)
    mask_tiles = key_mask.reshape(B, n_kv, bkv)

    if alibi_slopes is not None:
        slopes = alibi_slopes.astype(f32)
    else:
        slopes = None

    def tile_bias_mask(ki):
        kpos = ki * bkv + jnp.arange(bkv)
        m = kpos[None, :] <= qpos[:, None]
        if window > 0:
            m = jnp.logical_and(m, kpos[None, :] > qpos[:, None] - window)
        return m, kpos  # (T, bkv), (bkv,)

    def step(dq_acc, inp):
        ki, k_t, v_t, km_t = inp
        m2d, kpos = tile_bias_mask(ki)
        full_mask = jnp.logical_and(m2d[None, None],
                                    km_t[:, None, None, :].astype(bool))
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_t,
                       preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST) * scale
        if slopes is not None:
            s = s + slopes[None, :, None, None] * kpos.astype(f32)[None, None, None, :]
        p = jnp.where(full_mask, jnp.exp(s - lse[..., None]), 0.0)
        dv_t = jnp.einsum("bhqk,bhqd->bhkd", p, gf, preferred_element_type=f32,
                          precision=jax.lax.Precision.HIGHEST)
        dp = jnp.einsum("bhqd,bhkd->bhqk", gf, v_t, preferred_element_type=f32,
                        precision=jax.lax.Precision.HIGHEST)
        ds = p * (dp - D[..., None])
        dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds, k_t,
                                     preferred_element_type=f32,
                                     precision=jax.lax.Precision.HIGHEST) * scale
        dk_t = jnp.einsum("bhqk,bhqd->bhkd", ds, qf, preferred_element_type=f32,
                          precision=jax.lax.Precision.HIGHEST) * scale
        return dq_acc, (dk_t, dv_t)

    ks = jnp.arange(n_kv, dtype=jnp.int32)
    dq, (dk_tiles, dv_tiles) = jax.lax.scan(
        step, jnp.zeros((B, H, T, Dh), f32),
        (ks, jnp.moveaxis(k_tiles, 2, 0), jnp.moveaxis(v_tiles, 2, 0),
         jnp.moveaxis(mask_tiles, 1, 0)))
    dk = jnp.moveaxis(dk_tiles, 0, 2).reshape(B, H, T, Dh)
    dv = jnp.moveaxis(dv_tiles, 0, 2).reshape(B, H, T, Dh)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


flash_attention_trainable.defvjp(_flash_fwd, _flash_bwd)
