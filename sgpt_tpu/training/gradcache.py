"""GradCache: train with contrastive batches far larger than HBM allows.

The algorithm (vendored torch original at sentence_transformers/losses/GradCache/
src/grad_cache/grad_cache.py:169-280, and the repo's own JAX `cachex` recipe at
…/grad_cache/cachex/training.py:9-30 which this generalizes):

  1. encode the batch in chunks WITHOUT building the autodiff graph,
  2. differentiate the loss wrt the (small) representation matrix,
  3. re-encode each chunk under grad with the surrogate  sum(reps · rep_grad)
     — whose gradient wrt params equals the true loss gradient,
  4. accumulate per-chunk param grads with `lax.scan`.

Peak memory = one chunk's activations + the reps. The torch version needs
RandContext RNG capture so dropout replays identically between the two forwards
(grad_cache/context_managers.py:5-21); with explicit JAX PRNG keys the replay is
free: pass the same per-chunk key to both passes.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _scan_encode(encode_fn: Callable, params: Any, chunks: Any) -> jax.Array:
    """Encode (n_chunks, chunk, ...) inputs → (n_chunks*chunk, D) reps, no grad."""

    def step(_, chunk):
        return None, jax.lax.stop_gradient(encode_fn(params, chunk))

    _, reps = jax.lax.scan(step, None, chunks)
    return jnp.reshape(reps, (-1, reps.shape[-1]))


def _scan_cache_grad(encode_fn: Callable, params: Any, chunks: Any,
                     rep_grads: jax.Array, grads_acc: Any) -> Any:
    """Accumulate d(sum(encode(chunk)·cache))/dparams over chunks (true grads)."""
    n_chunks = jax.tree.leaves(chunks)[0].shape[0]
    rep_grads = rep_grads.reshape(n_chunks, -1, rep_grads.shape[-1])

    def surrogate(p, chunk, cache):
        return jnp.sum(encode_fn(p, chunk) * cache)

    def step(acc, inp):
        chunk, cache = inp
        g = jax.grad(surrogate)(params, chunk, cache)
        return jax.tree.map(jnp.add, acc, g), None

    grads, _ = jax.lax.scan(step, grads_acc, (chunks, rep_grads))
    return grads


def chunk_tree(tree: Any, chunk_size: int) -> Any:
    """(N, ...) pytree → (N//chunk_size, chunk_size, ...). N must divide evenly
    (pad the batch to a multiple — static shapes are the TPU contract)."""

    def rechunk(x):
        n = x.shape[0]
        assert n % chunk_size == 0, f"batch {n} not divisible by chunk {chunk_size}"
        return x.reshape(n // chunk_size, chunk_size, *x.shape[1:])

    return jax.tree.map(rechunk, tree)


def gradcache_value_and_grad(
    encode_fn: Callable[[Any, Any], jax.Array],
    loss_fn: Callable[..., jax.Array],
) -> Callable:
    """Build a (loss, grads) function over chunked towers.

    encode_fn(params, chunk_inputs) -> (chunk, D) representations
    loss_fn(*tower_reps) -> scalar (e.g. losses.mnrl_loss)

    Returned fn: f(params, *towers) where each tower is a pytree of
    (n_chunks, chunk, ...) arrays (see chunk_tree). Differentiation of loss_fn
    through collectives (mnrl_loss_dp) works — grads of reps flow locally.
    """

    def value_and_grad(params: Any, *towers: Any) -> Tuple[jax.Array, Any]:
        # Pass 1: chunked encode, no autodiff graph retained.
        reps = [_scan_encode(encode_fn, params, t) for t in towers]

        # Loss + grads wrt the representations only (small matrices).
        loss, rep_grads = jax.value_and_grad(
            lambda *r: loss_fn(*r), argnums=tuple(range(len(reps))))(*reps)

        # Pass 2: chunked re-encode with surrogate; accumulate param grads.
        grads = jax.tree.map(jnp.zeros_like, params)
        for tower, rg in zip(towers, rep_grads):
            grads = _scan_cache_grad(encode_fn, params, tower, rg, grads)
        return loss, grads

    return value_and_grad
