"""Ring attention — causal attention with the sequence axis sharded over the mesh.

The long-context extension SURVEY.md §5 marks as the optional stretch: the
reference simply truncates (max 2048 tokens); here sequence length scales with
the number of chips. Layout: Q stays resident per shard, K/V (+key-mask) blocks
rotate around the ring via `lax.ppermute`, and each step folds into the online-
softmax running state — the standard blockwise/ring recipe, expressed in plain
shard_map + XLA collectives so it runs identically on the CPU test mesh and on
ICI.

Causality across shards: global positions are reconstructed from the ring rank;
whole K/V blocks strictly in the future are folded as all-masked (they
contribute exp(-inf)=0 — simple and correct; skipping them is a latency
optimization left to the Pallas RDMA variant).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG = -1e30  # python float: module-level jnp scalars initialize the backend at import


def _local_ring_step(q, kv_k, kv_v, kv_mask, q_pos, kv_start, state, scale,
                     window, slopes=None):
    """Fold one K/V block into the online-softmax state."""
    m_prev, l_prev, acc = state
    s = jnp.einsum("bhqd,bhkd->bhqk", q, kv_k,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    if scale != 1.0:
        s = s * scale
    T_blk = kv_k.shape[2]
    kv_pos = kv_start + jnp.arange(T_blk)
    if slopes is not None:  # ALiBi: slope_h * key_position (right-padding form)
        s = s + slopes[None, :, None, None] * kv_pos.astype(jnp.float32)[None, None, None, :]
    mask = kv_pos[None, :] <= q_pos[:, None]
    if window > 0:
        mask = jnp.logical_and(mask, kv_pos[None, :] > q_pos[:, None] - window)
    mask = jnp.logical_and(mask[None, None],
                           kv_mask[:, None, None, :].astype(bool))
    s = jnp.where(mask, s, NEG)

    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(kv_v.dtype), kv_v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return m_new, l_new, acc_new


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "scale", "window"))
def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   key_mask: jax.Array,
                   alibi_slopes: Optional[jax.Array] = None, *,
                   mesh: Mesh, axis: str = "dp",
                   scale: float = 1.0, window: int = 0) -> jax.Array:
    """q, k, v: (B, H, T, Dh); key_mask: (B, T). T must divide by mesh[axis].

    Returns (B, H, T, Dh); numerically equal to single-device causal attention.
    """
    n_dev = mesh.shape[axis]
    B, H, T, Dh = q.shape
    assert T % n_dev == 0, (T, n_dev)
    T_local = T // n_dev
    slopes = (alibi_slopes.astype(jnp.float32)
              if alibi_slopes is not None else None)

    def shard_fn(q_s, k_s, v_s, mask_s):
        rank = jax.lax.axis_index(axis)
        q_pos = rank * T_local + jnp.arange(T_local)

        # the replicated init must be typed shard-varying so the loop carry
        # (which mixes with per-shard data) type-checks under shard_map
        state = jax.lax.pcast(
            (jnp.full((B, H, T_local, 1), NEG, jnp.float32),
             jnp.zeros((B, H, T_local, 1), jnp.float32),
             jnp.zeros((B, H, T_local, Dh), jnp.float32)),
            (axis,), to="varying")

        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def fold(step, state, kv_k, kv_v, kv_mask):
            src_rank = (rank - step) % n_dev
            return _local_ring_step(q_s, kv_k, kv_v, kv_mask, q_pos,
                                    src_rank * T_local, state, scale, window,
                                    slopes)

        def body(step, carry):
            state, kv_k, kv_v, kv_mask = carry
            state = fold(step, state, kv_k, kv_v, kv_mask)
            kv_k = jax.lax.ppermute(kv_k, axis, perm)
            kv_v = jax.lax.ppermute(kv_v, axis, perm)
            kv_mask = jax.lax.ppermute(kv_mask, axis, perm)
            return state, kv_k, kv_v, kv_mask

        # n_dev-1 fold+rotate rounds, then one final fold WITHOUT the
        # rotation (the old n_dev-round loop paid 3 ppermutes whose results
        # were discarded — pure ICI overhead, doubled by the backward pass)
        state, kv_k, kv_v, kv_mask = jax.lax.fori_loop(
            0, n_dev - 1, body, (state, k_s, v_s, mask_s))
        m, l, acc = fold(n_dev - 1, state, kv_k, kv_v, kv_mask)
        # rows with NO valid key anywhere keep m == NEG exactly: their p was
        # exp(0)=1 per key, so l sums to T (never 0 — the old l==0 guard was
        # dead) and acc/l would be mean(V). Zero them instead.
        dead = m <= NEG / 2
        l = jnp.where(dead, 1.0, l)
        return jnp.where(dead, 0.0, acc / l).astype(q_s.dtype)

    return jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, None, axis, None), P(None, None, axis, None),
                  P(None, None, axis, None), P(None, axis)),
        out_specs=P(None, None, axis, None))(q, k, v, key_mask)
