"""Shared CLI plumbing: logging setup + model construction from flags."""
from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def setup_logging():
    logging.basicConfig(
        format="%(asctime)s - %(message)s", datefmt="%Y-%m-%d %H:%M:%S",
        level=logging.INFO)
    # Honor an explicit JAX_PLATFORMS even when a hardware-plugin
    # sitecustomize re-pointed jax at its backend before main() ran
    # (same counter-override as tests/conftest.py).
    import os
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def add_mesh_args(parser):
    parser.add_argument("--dp", type=int, default=-1,
                        help="data-parallel mesh axis (-1 = all devices / tp)")
    parser.add_argument("--tp", type=int, default=1,
                        help="tensor-parallel mesh axis (Megatron sharding; "
                        "replaces the reference's device_map='auto', sgptce.py:54)")
    return parser


def build_mesh(args):
    """Mesh from --dp/--tp flags; None for the trivial 1-device case.

    dp=1, tp=1 is an explicit single-device request (the train CLIs default to
    it — multi-device training is opt-in, like the reference only going DDP
    under `accelerate launch`); dp=-1 means all devices."""
    import jax
    if args.tp == 1 and args.dp == 1:
        return None
    if args.tp == 1 and args.dp == -1 and jax.device_count() == 1:
        return None
    from ..parallel import make_mesh
    return make_mesh(dp=args.dp, tp=args.tp)


def maybe_shard(params, mesh):
    if mesh is None:
        return params
    from ..parallel import shard_params
    return shard_params(params, mesh)


def build_model(model_name: str, *, random_init: bool = False,
                dtype_str: str = "bfloat16"):
    """(params, cfg, tokenizer) from an HF name/path, or a random-init preset.

    `--randominit` mirrors the reference's `--reinit` debugging flag
    (beir_dense_retriever.py:124-126) and doubles as the zero-egress smoke path.
    """
    from ..models import (gpt_neo, gpt_j_6b, bloom, bert, t5, load_pretrained,
                          init_params, cast_params, guess_family)
    from ..tokenization import get_tokenizer

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_str]
    low = model_name.lower()
    if random_init:
        if "6b" in low or "5.8b" in low or "6.1b" in low:
            cfg = gpt_j_6b()
        elif "bert" in low:
            cfg = bert("large" if "large" in low else "base")
        elif "bloom" in low:
            cfg = bloom("1b7")
        elif "t5" in low:
            cfg = t5("large" if "large" in low
                     else "small" if "small" in low else "base")
            if "v1_1" in low or "v1.1" in low:
                cfg = cfg.replace(mlp_activation="gated_gelu")
        elif "1.3b" in low:
            cfg = gpt_neo("1.3b")
        elif "2.7b" in low:
            cfg = gpt_neo("2.7b")
        else:
            cfg = gpt_neo("125m")
        cfg = cfg.replace(dtype=dtype, matmul_precision="default")
        params = cast_params(init_params(cfg, jax.random.key(0)), dtype)
    else:
        params, cfg = load_pretrained(model_name, dtype=dtype)
        cfg = cfg.replace(dtype=dtype)
        if dtype != jnp.float32:
            cfg = cfg.replace(matmul_precision="default")
    # Real weights demand the real tokenizer: fallback=False turns the old
    # silent hash-tokenizer fallback (which would corrupt a score-parity run
    # with plausible-but-wrong nDCG) into a hard TokenizerLoadError.
    tokenizer = (get_tokenizer(None, vocab_size=cfg.vocab_size) if random_init
                 else get_tokenizer(model_name, fallback=False))
    if jax.default_backend() == "tpu":
        # fused short-T attention kernel everywhere on TPU (CE scoring and
        # training included): ~1.8x the XLA attention at T <= 512; the
        # decoder falls back automatically beyond the T cap (docs/PERF.md)
        cfg = cfg.replace(fused_attention=True)
    return params, cfg, tokenizer
