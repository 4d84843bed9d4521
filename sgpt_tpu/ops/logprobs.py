"""Batched continuation log-probability scoring (the SGPT-CE hot kernel).

One fused jit: decoder forward → LM head → log_softmax → gather continuation
token log-probs → masked sum. Replaces the reference's per-chunk
`log_softmax` + python slicing + `gather` + host sum
(crossencoder/beir/sgptce.py:237-260) — here the continuation window is
expressed as a (B, T) target/weight pair so shapes stay static and the whole
score computes on device.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.config import DecoderConfig
from ..models.decoder import forward, logits


@partial(jax.jit, static_argnames=("cfg",))
def continuation_scores(params, input_ids, attention_mask, targets, target_mask,
                        cfg: DecoderConfig, vocab_mask: Optional[jax.Array] = None):
    """Sum of log P(target_t | prefix) over positions where target_mask==1.

    input_ids:  (B, T) the packed (context + continuation)[:-1] rows
    targets:    (B, T) token ids to score at each position (shifted by one)
    target_mask:(B, T) 1.0 on continuation positions, 0 elsewhere
    vocab_mask: optional (V,) bool — restrict softmax support to a vocab subset
                (the reference's sub_select_idx ablation, sgptce.py:227-235)
    """
    h = forward(params, input_ids, attention_mask, cfg)
    lg = logits(params, h, cfg).astype(jnp.float32)
    if vocab_mask is not None:
        lg = jnp.where(vocab_mask[None, None, :], lg, jnp.float32(-jnp.inf))
    logp = jax.nn.log_softmax(lg, axis=-1)
    tok_lp = jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    # where() not multiply: with vocab masking, off-target positions can be
    # -inf and -inf * 0 would poison the sum with NaN
    tok_lp = jnp.where(target_mask.astype(bool), tok_lp, 0.0)
    return jnp.sum(tok_lp, axis=1)


@partial(jax.jit, static_argnames=("cfg", "tp_mesh"))
def continuation_scores_gathered(params, input_ids, attention_mask,
                                 cont_positions, cont_targets, cont_mask,
                                 cfg: DecoderConfig,
                                 vocab_mask: Optional[jax.Array] = None,
                                 tp_mesh=None):
    """continuation_scores with the LM head applied ONLY at the scored
    positions: hidden states gather to (B, C) continuation windows BEFORE the
    vocab projection, so the (B, T, V) logits tensor (50k-wide fp32, plus its
    log_softmax traffic) never materializes. C ~ 16-64 vs T ~ 256-2048 makes
    the head ~T/C times cheaper. Mathematically identical to the full scorer
    (each position's logits are independent).

    cont_positions: (B, C) int32 input positions whose next-token logprobs are
    scored (clipped in-range for padding slots); cont_targets/cont_mask: (B, C).

    tp_mesh: dp×tp mesh with Megatron-sharded params — enables the fused
    attention kernel per head-shard at CE flagship widths (GPT-J at tp>=2;
    models/decoder.fused_attention_layer).
    """
    h = forward(params, input_ids, attention_mask, cfg, tp_mesh=tp_mesh)
    hc = jnp.take_along_axis(
        h, cont_positions[..., None].astype(jnp.int32), axis=1)     # (B, C, D)
    lg = logits(params, hc, cfg).astype(jnp.float32)                # (B, C, V)
    if vocab_mask is not None:
        lg = jnp.where(vocab_mask[None, None, :], lg, jnp.float32(-jnp.inf))
    logp = jax.nn.log_softmax(lg, axis=-1)
    tok_lp = jnp.take_along_axis(logp, cont_targets[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    tok_lp = jnp.where(cont_mask.astype(bool), tok_lp, 0.0)
    return jnp.sum(tok_lp, axis=1)


@partial(jax.jit, static_argnames=("cfg", "n_seg", "tp_mesh"))
def continuation_scores_packed(params, input_ids, attention_mask,
                               position_ids, segment_ids,
                               cont_positions, cont_targets, cont_mask,
                               cont_seg, cfg: DecoderConfig, n_seg: int,
                               vocab_mask: Optional[jax.Array] = None,
                               tp_mesh=None):
    """Per-SEGMENT continuation scores for sequence-packed rows.

    Multiple independent (context, continuation) requests share one row:
    attention is block-diagonal over `segment_ids` and positions restart per
    segment (models/decoder.forward segment_ids docs), so each segment's
    log-probs equal its standalone-row scores. Packing removes the padding
    the reference's fixed-row batching pays on ragged mixes
    (crossencoder/beir/sgptce.py:168,214-217): every row is ~full.

    cont_seg: (B, C) int32 — which segment slot [0, n_seg) each continuation
    slot belongs to (padding slots have cont_mask 0 and any slot value).
    Returns (B, n_seg) summed log-probs; unused segment slots sum to 0.
    """
    h = forward(params, input_ids, attention_mask, cfg,
                position_ids=position_ids, segment_ids=segment_ids,
                tp_mesh=tp_mesh)
    hc = jnp.take_along_axis(
        h, cont_positions[..., None].astype(jnp.int32), axis=1)     # (B, C, D)
    lg = logits(params, hc, cfg).astype(jnp.float32)                # (B, C, V)
    if vocab_mask is not None:
        lg = jnp.where(vocab_mask[None, None, :], lg, jnp.float32(-jnp.inf))
    logp = jax.nn.log_softmax(lg, axis=-1)
    tok_lp = jnp.take_along_axis(logp, cont_targets[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    tok_lp = jnp.where(cont_mask.astype(bool), tok_lp, 0.0)         # (B, C)
    # one-hot segment reduction: C and n_seg are both small (<= a few hundred
    # slots x <= 16 segments), so the (B, C, S) intermediate is cheap and the
    # reduction stays a single fused matmul-like contraction on device
    onehot = jax.nn.one_hot(cont_seg, n_seg, dtype=tok_lp.dtype)    # (B, C, S)
    return jnp.einsum("bc,bcs->bs", tok_lp, onehot)


@partial(jax.jit, static_argnames=("cfg",))
def greedy_continuations(params, input_ids, attention_mask, cfg: DecoderConfig):
    """Argmax next-token ids (B, T) — for greedy-match diagnostics."""
    h = forward(params, input_ids, attention_mask, cfg)
    return jnp.argmax(logits(params, h, cfg), axis=-1)
