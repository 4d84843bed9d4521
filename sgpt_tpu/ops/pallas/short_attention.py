"""Fused short-sequence causal attention — the BEIR-encode hot kernel.

Motivation (measured, docs/PERF.md): at the flagship encode shape (B=256,
T=304, GPT-Neo-125M) the XLA attention path spends >50% of the forward on the
(B, H, T, T) fp32 score round-trips to HBM — ~5 GB per layer of traffic for
6% of the FLOPs. Flash attention does not help at this T (block overheads and
bucket padding cost more than they save — tools/bench_flash_vs_xla.py).

This kernel targets exactly the short-T regime instead:
  * one grid step per batch row; all H heads loop inside the step,
  * q/k/v stay in the (B, T, H*Dh) projection layout — no transposes anywhere,
    each head is a contiguous 64-lane column slice,
  * the full (T, T) score matrix lives in VMEM only: matmul → mask → fp32
    softmax → (bf16 probs) @ v, nothing round-trips to HBM,
  * numerics REPLICATE the XLA path bit-for-bit-close: fp32 scores, -1e9
    additive mask, fp32 softmax, probs cast to the activation dtype before
    the AV matmul with fp32 accumulation (models/decoder.py:attention).
    Caveat: the kernel's MXU dots always run DEFAULT precision — for bf16
    production configs that is identical to the XLA path, but fp32 configs
    with matmul_precision="highest" (tests, tiny models) see ~1e-3 relative
    gradient differences vs the XLA path's multi-pass fp32 matmuls
    (measured on-chip: max 0.3% per-leaf relative on a 2-layer fp32 model).

Covers all three families: optional 1/sqrt(Dh) scaling (GPT-J), sliding
window (GPT-Neo local layers), ALiBi (BLOOM; raw key index == BLOOM's
cumsum-1 position because padded keys are masked), key padding mask.

Differentiable: custom VJP with a matching Pallas BACKWARD kernel on TPU
(same per-batch-row grid; recomputes the (T, T) scores in VMEM, applies the
softmax VJP in fp32, and never materializes O(B·H·T²) in HBM — the residuals
are just q/k/v/g). On other backends the backward falls back to the exact
XLA reference. Measured (125M, T=304): grad steps 431 → 504 seq/s (+17%) at
B=32, and B=64 two-step grads RUN where the XLA-attention backward exceeds
HBM (20.9G needed of 15.75G); against an all-fp32 oracle the kernel's
gradients are ~100x closer than the XLA bf16 reference VJP's (rms 1e-5 vs
7e-3 — the fp32 softmax cotangent never rounds through bf16).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9  # the XLA path's mask constant (decoder.NEG_INF); plain python
            # float — a jnp scalar would be a captured tracer in the kernel


def _build_mask(keymask_ref, seg_ref, T: int, window: int,
                use_segments: bool):
    """(T, T) boolean attention mask shared by fwd and bwd kernels: causal
    [∧ sliding window] ∧ key padding [∧ same-segment block diagonal].

    Segment packing: queries see only keys of the SAME segment id — packed
    segments are contiguous spans, so the causal/window terms on the RAW
    frame coincide with each segment's standalone mask (crossencoder.py
    pack_t; decoder._mask_bias carries the identical XLA-path semantics)."""
    km = keymask_ref[0, 0, :] > 0                                  # (T,)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    mask = kpos <= qpos
    if window > 0:
        mask = jnp.logical_and(mask, kpos > qpos - window)
    mask = jnp.logical_and(mask, km[None, :])
    if use_segments:
        seg = seg_ref[0, 0, :]                                     # (T,)
        mask = jnp.logical_and(mask, seg[None, :] == seg[:, None])
    return mask


def _kernel(keymask_ref, slopes_ref, seg_ref, kpos_ref,
            q_ref, k_ref, v_ref, o_ref, *,
            scale: float, window: int, H: int, Dh: int, use_alibi: bool,
            use_segments: bool):
    T = q_ref.shape[1]
    mask = _build_mask(keymask_ref, seg_ref, T, window, use_segments)
    # ALiBi keys use the SUPPLIED positions row (restarts per segment when
    # packed; arange — BLOOM's cumsum-1 under right padding — otherwise)
    kpos_f = (kpos_ref[0, 0, :].astype(jnp.float32)[None, :]
              if use_alibi else None)

    for h in range(H):
        sl = pl.dslice(h * Dh, Dh)
        q = q_ref[0, :, sl]                                        # (T, Dh)
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        if use_alibi:
            s = s + slopes_ref[0, 0, h] * kpos_f
        s = jnp.where(mask, s, NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _bwd_kernel(keymask_ref, slopes_ref, seg_ref, kpos_ref,
                q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *,
                scale: float, window: int, H: int, Dh: int, use_alibi: bool,
                use_segments: bool):
    """Backward: recompute scores/probs per head in VMEM, softmax VJP in fp32.

    dV = Pᵀ g;  dP = g Vᵀ;  dS = P ∘ (dP − rowsum(dP ∘ P)), then dS is
    re-masked (the XLA reference's jnp.where VJP zeroes the cotangent at
    masked score positions);  dQ = scale·dS K;  dK = scale·dSᵀ Q.  The
    additive pieces of S (mask, ALiBi) are q/k-independent, so they
    contribute nothing extra.  For partially-masked rows P = 0 at masked
    entries already gives dS = 0 there, but FULLY-masked rows (padded query
    positions past a local window) softmax to uniform P = 1/T, so without
    the explicit re-mask they would leak nonzero dq and corrupt dk at valid
    key rows."""
    T = q_ref.shape[1]
    mask = _build_mask(keymask_ref, seg_ref, T, window, use_segments)
    kpos_f = (kpos_ref[0, 0, :].astype(jnp.float32)[None, :]
              if use_alibi else None)

    for h in range(H):
        sl = pl.dslice(h * Dh, Dh)
        q = q_ref[0, :, sl]                                        # (T, Dh)
        k = k_ref[0, :, sl]
        v = v_ref[0, :, sl]
        gh = g_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        if use_alibi:
            s = s + slopes_ref[0, 0, h] * kpos_f
        s = jnp.where(mask, s, NEG)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=1, keepdims=True)                  # (T, T) f32

        pb = p.astype(v.dtype)
        dv = jax.lax.dot_general(pb, gh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(gh, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        ds = jnp.where(mask, ds, 0.0)  # where-VJP: fully-masked rows → dS = 0
        if scale != 1.0:
            ds = ds * scale
        # ds stays fp32 for the dq/dk dots: casting it to bf16 loses ~1% of
        # tensor scale through cancellation (ds entries are O(1/T)); the XLA
        # reference VJP keeps the softmax cotangent in fp32 too
        k32 = k.astype(jnp.float32)
        q32 = q.astype(jnp.float32)
        dq = jax.lax.dot_general(ds, k32, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(ds, q32, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _seg_kpos_blocks(key_mask, segments, positions, B: int, T: int):
    """Host-side prep of the (B, 1, T) int32 seg/kpos blocks. Unpacked rows
    pass a zero segment block (masked out of the kernel by use_segments) and
    arange positions (== the old iota ALiBi key index)."""
    seg = (segments if segments is not None
           else jnp.zeros_like(key_mask)).astype(jnp.int32).reshape(B, 1, T)
    kp = (positions if positions is not None
          else jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T)))
    return seg, kp.astype(jnp.int32).reshape(B, 1, T)


def _short_attention_bwd_impl(q2, k2, v2, key_mask, slopes, seg, kpos, g,
                              scale, window, H, use_alibi, use_segments,
                              interpret: Optional[bool] = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, HD = q2.shape
    Dh = HD // H
    kernel = functools.partial(_bwd_kernel, scale=scale, window=window,
                               H=H, Dh=Dh, use_alibi=use_alibi,
                               use_segments=use_segments)
    shape = jax.ShapeDtypeStruct((B, T, HD), q2.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0)),  # key mask
            pl.BlockSpec((1, 1, H), lambda b: (0, 0, 0)),  # alibi slopes
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0)),  # segment ids
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0)),  # key positions
            pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0)),  # cotangent
        ],
        out_specs=[pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0))] * 3,
        out_shape=[shape, shape, shape],
        interpret=interpret,
    )(key_mask.astype(jnp.int32).reshape(B, 1, T),
      slopes.reshape(1, 1, H).astype(jnp.float32), seg, kpos, q2, k2, v2, g)


def _reference_hd(q2, k2, v2, key_mask, slopes, *, scale: float, window: int,
                  H: int, use_alibi: bool, segments=None, positions=None):
    """Identical math via XLA einsums (the decoder.attention recipe) — the
    custom-VJP backward and the parity oracle."""
    B, T, HD = q2.shape
    Dh = HD // H
    q = q2.reshape(B, T, H, Dh)
    k = k2.reshape(B, T, H, Dh)
    v = v2.reshape(B, T, H, Dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32)
    if scale != 1.0:
        s = s * scale
    i = jnp.arange(T)
    mask = i[None, :] <= i[:, None]
    if window > 0:
        mask = jnp.logical_and(mask, i[None, :] > i[:, None] - window)
    mask = jnp.logical_and(mask[None, None],
                           (key_mask > 0)[:, None, None, :])
    if segments is not None:
        same = segments[:, :, None] == segments[:, None, :]
        mask = jnp.logical_and(mask, same[:, None])
    if use_alibi:
        kp = (positions if positions is not None
              else jnp.broadcast_to(jnp.arange(T), (B, T)))
        s = s + (slopes[None, :, None, None]
                 * kp.astype(jnp.float32)[:, None, None, :])
    s = jnp.where(mask, s, NEG)
    p = jax.nn.softmax(s, axis=-1).astype(q2.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o.reshape(B, T, HD)


def short_attention(q2, k2, v2, key_mask, slopes,
                    scale: float, window: int, H: int, use_alibi: bool,
                    segments=None, positions=None):
    """q2/k2/v2: (B, T, H*Dh) projection outputs (post-rope, pre-head-split).
    key_mask: (B, T). slopes: (H,) fp32 (zeros when use_alibi=False).
    segments: optional (B, T) int32 — SEQUENCE PACKING: queries attend only
    to keys of the same segment id (block-diagonal within causal; segments
    must be contiguous spans so window offsets stay frame-correct).
    positions: optional (B, T) int32 ALiBi key positions (restart per
    segment when packed); defaults to arange. Returns (B, T, H*Dh)."""
    B, T, _ = q2.shape
    seg, kpos = _seg_kpos_blocks(key_mask, segments, positions, B, T)
    return _short_attention_core(q2, k2, v2, key_mask, slopes, seg, kpos,
                                 scale, window, H, use_alibi,
                                 segments is not None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _short_attention_core(q2, k2, v2, key_mask, slopes, seg, kpos,
                          scale: float, window: int, H: int, use_alibi: bool,
                          use_segments: bool):
    return _short_attention_fwd_impl(q2, k2, v2, key_mask, slopes, seg, kpos,
                                     scale, window, H, use_alibi,
                                     use_segments)


def _short_attention_fwd_impl(q2, k2, v2, key_mask, slopes, seg, kpos,
                              scale, window, H, use_alibi, use_segments,
                              interpret: Optional[bool] = None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, T, HD = q2.shape
    Dh = HD // H
    kernel = functools.partial(_kernel, scale=scale, window=window,
                               H=H, Dh=Dh, use_alibi=use_alibi,
                               use_segments=use_segments)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            # 3D with a singleton middle axis: Mosaic requires the last two
            # block dims divisible by (8, 128) OR equal to the array dims
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0)),  # key mask
            pl.BlockSpec((1, 1, H), lambda b: (0, 0, 0)),  # alibi slopes
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0)),  # segment ids
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0)),  # key positions
            pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), q2.dtype),
        interpret=interpret,
    )(key_mask.astype(jnp.int32).reshape(B, 1, T),
      slopes.reshape(1, 1, H).astype(jnp.float32), seg, kpos, q2, k2, v2)


def _fwd(q2, k2, v2, key_mask, slopes, seg, kpos,
         scale, window, H, use_alibi, use_segments):
    out = _short_attention_fwd_impl(q2, k2, v2, key_mask, slopes, seg, kpos,
                                    scale, window, H, use_alibi, use_segments)
    return out, (q2, k2, v2, key_mask, slopes, seg, kpos)


_VMEM_BUDGET = 14 * 1024 * 1024


def fwd_fits_vmem(T: int, HD: int, itemsize: int) -> bool:
    """Whether the forward kernel's per-grid-step residency fits VMEM.

    The forward holds 5 logical (T, HD) blocks (q/k/v/mask in, o out), but
    Mosaic double-buffers pipeline blocks: the observed allocation is ~8
    block-equivalents (measured: D=4096/T=304/bf16 requests 19.04 MB ≈ 7.65
    blocks of 2.49 MB against the 16 MB limit), plus two (T, T) fp32 score
    temps live in the per-head loop. Budget 14 MB so large-D models (GPT-J
    D=4096 at any fused-window T) take the XLA path instead of failing
    Mosaic stack allocation at compile time."""
    return 8 * T * HD * itemsize + 2 * T * T * 4 <= _VMEM_BUDGET


def _bwd_fits_vmem(T: int, HD: int, itemsize: int) -> bool:
    """The backward holds 7 logical (T, HD) blocks (q/k/v/g in, dq/dk/dv
    out) — ~11 block-equivalents after Mosaic double-buffering (same ~1.5x
    ratio measured on the forward) — plus ~4 (T, T) fp32 softmax-VJP temps.
    Same 14 MB budget: over it, fall back to the exact XLA VJP."""
    return 11 * T * HD * itemsize + 4 * T * T * 4 <= _VMEM_BUDGET


def _bwd(scale, window, H, use_alibi, use_segments, res, g):
    q2, k2, v2, key_mask, slopes, seg, kpos = res
    if (jax.default_backend() == "tpu"
            and _bwd_fits_vmem(q2.shape[1], q2.shape[2], q2.dtype.itemsize)):
        dq, dk, dv = _short_attention_bwd_impl(
            q2, k2, v2, key_mask, slopes, seg, kpos, g,
            scale, window, H, use_alibi, use_segments)
        return dq, dk, dv, None, None, None, None
    # other backends: exact gradients through the identical-math XLA
    # reference (recompute); also the parity oracle for the kernel above
    B, T, _ = q2.shape
    segments = seg.reshape(B, T) if use_segments else None
    positions = kpos.reshape(B, T)

    def f(q2_, k2_, v2_):
        return _reference_hd(q2_, k2_, v2_, key_mask, slopes, scale=scale,
                             window=window, H=H, use_alibi=use_alibi,
                             segments=segments, positions=positions)
    _, vjp = jax.vjp(f, q2, k2, v2)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None, None, None


_short_attention_core.defvjp(_fwd, _bwd)
