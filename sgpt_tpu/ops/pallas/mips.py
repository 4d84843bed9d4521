"""Pallas streaming MIPS kernel: fused score matmul + on-chip top-k.

The BASELINE.json headline kernel: corpus embedding tiles stream from HBM
through the Pallas pipeline (which double-buffers input windows automatically —
the next tile's DMA overlaps the current tile's matmul), scores hit the MXU in
fp32, and a per-query running top-k lives in VMEM scratch across the whole
scan. The (Q, N) score matrix never exists in HBM — the kernel's only outputs
are (Q, k) values and indices.

Top-k is k unrolled max-extract passes per tile plus a k-pass merge with the
running buffer — vector work that is negligible next to the (Q, D)x(D, tile)
matmul for k ≤ ~16. For larger k use ops.topk.blockmax_topk (XLA two-phase).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30  # plain python float: jnp scalars would be captured tracers in the kernel


def _extract_topk(s: jax.Array, col0: jax.Array, k: int):
    """Top-k of each row of s (Q, T) by k max-extract passes.
    Returns (vals (Q, k), idx (Q, k)); ties resolve to the lowest index."""
    Q, T = s.shape
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (Q, T), 1)
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(s, axis=1, keepdims=True)                  # (Q, 1)
        is_max = s == m
        idx = jnp.min(jnp.where(is_max, cols, jnp.int32(2**31 - 1)),
                      axis=1, keepdims=True)                   # (Q, 1)
        vals.append(m)
        idxs.append(idx)
        s = jnp.where(cols == idx, NEG, s)
    return jnp.concatenate(vals, axis=1), jnp.concatenate(idxs, axis=1)


def _mips_kernel(valid_ref, q_ref, tile_ref, ov_ref, oi_ref,
                 rv_scr, ri_scr, *, k: int, tile_n: int):
    ti = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(ti == 0)
    def _init():
        rv_scr[:] = jnp.full_like(rv_scr, NEG)
        ri_scr[:] = jnp.zeros_like(ri_scr)

    q = q_ref[:]
    tile = tile_ref[:]
    s = jax.lax.dot_general(q, tile, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (Q, tile_n)
    base = ti * tile_n
    col = base + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < valid_ref[0], s, NEG)

    t_vals, t_idx = _extract_topk(s, jnp.int32(base), k)

    # merge running (Q, k) with tile (Q, k): top-k of the 2k union
    cat_v = jnp.concatenate([rv_scr[:], t_vals], axis=1)
    cat_i = jnp.concatenate([ri_scr[:], t_idx], axis=1)
    Q = cat_v.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, cat_v.shape, 1)
    new_v, new_i = [], []
    for _ in range(k):
        m = jnp.max(cat_v, axis=1, keepdims=True)
        is_max = cat_v == m
        p = jnp.min(jnp.where(is_max, pos, jnp.int32(2**31 - 1)), axis=1,
                    keepdims=True)
        sel = pos == p
        new_v.append(m)
        new_i.append(jnp.sum(jnp.where(sel, cat_i, 0), axis=1, keepdims=True))
        cat_v = jnp.where(sel, NEG, cat_v)
    rv_scr[:] = jnp.concatenate(new_v, axis=1)
    ri_scr[:] = jnp.concatenate(new_i, axis=1)

    @pl.when(ti == n_tiles - 1)
    def _finalize():
        ov_ref[:] = rv_scr[:]
        oi_ref[:] = ri_scr[:]


@functools.partial(jax.jit,
                   static_argnames=("k", "tile_n", "interpret"))
def mips_topk(queries: jax.Array, corpus: jax.Array, valid_count,
              k: int = 10, tile_n: int = 2048,
              interpret: bool | None = None) -> Tuple[jax.Array, jax.Array]:
    """queries (Q, D) resident in VMEM; corpus (N, D) streamed from HBM.
    N % tile_n == 0 (pad; rows >= valid_count are masked). k <= 16.
    Returns (vals (Q, k) desc-sorted, idx (Q, k))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    Q, D = queries.shape
    N = corpus.shape[0]
    tile_n = min(tile_n, N)
    assert N % tile_n == 0, (N, tile_n)
    assert k <= 16, "use blockmax_topk for large k"
    n_tiles = N // tile_n

    valid = jnp.asarray([valid_count], jnp.int32)

    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    except TypeError:
        compiler_params = None

    return pl.pallas_call(
        functools.partial(_mips_kernel, k=k, tile_n=tile_n),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                   # valid
            pl.BlockSpec((Q, D), lambda ti: (0, 0)),                 # queries
            pl.BlockSpec((tile_n, D), lambda ti: (ti, 0)),           # corpus tile
        ],
        out_specs=(
            pl.BlockSpec((Q, k), lambda ti: (0, 0)),
            pl.BlockSpec((Q, k), lambda ti: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Q, k), jnp.float32),
            pltpu.VMEM((Q, k), jnp.int32),
        ],
        **({"compiler_params": compiler_params} if compiler_params else {}),
        interpret=interpret,
    )(valid, queries, corpus)
