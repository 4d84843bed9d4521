"""Parameter pytree construction for the unified decoder.

Layout: per-layer tensors are stacked along a leading layer axis so the whole
stack runs under one `lax.scan` (see decoder.forward). Linear weights are stored
[in, out] (activation @ W), the transpose of torch's [out, in].
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import DecoderConfig


def param_shapes(cfg: DecoderConfig) -> dict:
    """Shape-structs of the parameter pytree (leading L axis on layer params)."""
    D, F, L = cfg.hidden_size, cfg.mlp_size, cfg.num_layers
    P = cfg.num_heads * cfg.head_size
    attn = {"wq": (L, D, P), "wk": (L, D, P), "wv": (L, D, P), "wo": (L, P, D)}
    if cfg.qkv_bias:
        attn.update({"bq": (L, P), "bk": (L, P), "bv": (L, P)})
    if cfg.out_bias:
        attn["bo"] = (L, D)

    def ln(*shape):  # RMSNorm (T5) carries a scale only
        return ({"scale": shape} if cfg.norm_style == "rms"
                else {"scale": shape, "bias": shape})

    mlp = {"wi": (L, D, F), "wo": (L, F, D)}
    if cfg.mlp_activation == "gated_gelu":
        mlp["wg"] = (L, D, F)  # T5 v1.1: gelu(wi(x)) * wg(x)
    if cfg.mlp_bias:
        mlp.update({"bi": (L, F), "bo": (L, D)})
    layers = {
        "ln1": ln(L, D),
        "attn": attn,
        "mlp": mlp,
    }
    if not cfg.parallel_residual:
        layers["ln2"] = ln(L, D)
    tree = {
        "wte": (cfg.vocab_size, D),
        "layers": layers,
    }
    if not cfg.post_layernorm:
        # BERT-style post-LN blocks end on their own LayerNorm; no final ln_f
        tree["ln_f"] = ln(D)
    if cfg.position_embedding == "learned":
        tree["wpe"] = (cfg.max_position_embeddings, D)
    if cfg.embedding_layernorm:
        tree["emb_ln"] = {"scale": (D,), "bias": (D,)}
    if cfg.token_type_vocab:
        tree["wtt"] = (cfg.token_type_vocab, D)
    if cfg.relative_attention:
        # T5: ONE bias table, computed in layer 0 and shared by every layer
        # (HF passes layer 0's position_bias down the stack)
        tree["rel_bias"] = (cfg.relative_attention_buckets, cfg.num_heads)
    return tree


def init_params(cfg: DecoderConfig, key: jax.Array,
                dtype: Optional[jnp.dtype] = None) -> dict:
    """Random init (GPT-2-style 0.02 normal; ln scale=1, biases=0)."""
    dtype = dtype or cfg.dtype
    shapes = param_shapes(cfg)
    leaves, treedef = jax.tree.flatten(shapes, is_leaf=lambda x: isinstance(x, tuple))
    keys = jax.random.split(key, len(leaves))
    paths = jax.tree_util.tree_flatten_with_path(
        shapes, is_leaf=lambda x: isinstance(x, tuple))[0]

    out = []
    for (path, shape), k in zip(paths, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("scale",):
            out.append(jnp.ones(shape, dtype))
        elif name.startswith("b") or name == "bias":
            out.append(jnp.zeros(shape, dtype))
        else:
            out.append(0.02 * jax.random.normal(k, shape, dtype))
    return jax.tree.unflatten(treedef, out)


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def cast_params(params, dtype):
    """Cast floating-point leaves (e.g. to bf16 for serving)."""
    return jax.tree.map(lambda x: x.astype(dtype), params)
