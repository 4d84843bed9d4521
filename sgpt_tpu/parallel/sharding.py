"""Partition specs: Megatron-style tensor parallelism for the decoder pytree.

Replaces the reference's model-parallel story (`device_map="auto"` layer
offloading for GPT-J/BLOOM inference, crossencoder/beir/sgptce.py:54-60) with
proper TP weight sharding over ICI:

  * attention qkv projections: output (head) axis sharded  → column parallel
  * attention output proj:     input  (head) axis sharded  → row parallel
  * mlp in:  output axis sharded; mlp out: input axis sharded
  * embeddings: hidden axis sharded (logits contraction psums over tp)
  * layernorms / small biases: replicated

XLA inserts the (all-gather / reduce-scatter / psum) collectives from these
annotations; no hand-written NCCL calls to port.
"""
from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching a decoder params pytree (models/params.py)."""

    def spec_for(path, leaf) -> P:
        keys = [p.key for p in path if hasattr(p, "key")]
        name = keys[-1]
        ndim = leaf.ndim if hasattr(leaf, "ndim") else len(leaf)
        in_layers = "layers" in keys

        if name in ("q", "s") and len(keys) >= 2:
            # int8-quantized kernel leaf {"q", "s"} (ops/quant.py): "q" has
            # the float kernel's shape and takes its spec; the per-output-
            # channel scales "s" follow column-parallel output shards but
            # stay replicated for row-parallel kernels (their axis-1 is the
            # size-1 keepdim, and the rescale happens after the psum).
            kind, name = name, keys[-2]
            if kind == "s":
                if name in ("wq", "wk", "wv", "wi"):  # (L, 1, F) col parallel
                    return P(None, None, "tp")
                return P(*([None] * ndim))

        if name in ("wq", "wk", "wv"):          # (L, D, H*Dh) column parallel
            return P(None, None, "tp")
        if name == "wo" and "attn" in keys:      # (L, H*Dh, D) row parallel
            return P(None, "tp", None)
        if name == "wi":                         # (L, D, F) column parallel
            return P(None, None, "tp")
        if name == "wo" and "mlp" in keys:       # (L, F, D) row parallel
            return P(None, "tp", None)
        if name in ("bq", "bk", "bv"):           # (L, H*Dh) follow column shards
            return P(None, "tp")
        if name == "bi":                         # (L, F)
            return P(None, "tp")
        if name in ("wte", "wpe"):               # (V|P, D) hidden axis sharded
            return P(None, "tp")
        if name == "w" and "lm_head" in keys:    # (D, V) vocab axis sharded
            return P(None, "tp")
        # ln scales/biases, residual-side biases: replicated
        return P(*([None] * ndim)) if in_layers else P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Device-put the param pytree with TP specs over `mesh`."""
    specs = param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def data_spec(ndim: int = 2) -> P:
    """Batch-sharded activation/data spec: (batch over dp, rest replicated)."""
    return P("dp", *([None] * (ndim - 1)))


def constrain(x, mesh: Mesh, spec: P):
    """`with_sharding_constraint` under an explicit mesh."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
