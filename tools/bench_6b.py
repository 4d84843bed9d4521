"""GPT-J-6B (the SGPT-5.8B flagship architecture) on ONE TPU chip.

The reference cannot run its 5.8B/6.1B models on one device: inference needs
HF `device_map="auto"` layer sharding across GPUs plus disk offload
(crossencoder/beir/sgptce.py:54-60). This bench demonstrates — with measured
numbers, not projections — that the TPU build serves the flagship scale on a
single chip:

  * bf16: 10.89 GiB of weights fit the ~15.75 GB HBM alongside encode
    activations at BEIR length (T=304),
  * int8 (ops/quant.py): 5.64 GiB of weights — half the HBM, and ~1.5x the
    matmul rate at D=4096 (per-channel weight scales, dynamic per-token
    activation scales; same scheme as `EmbeddingEngine(quantize="int8")`).

Methodology: same cache-proof scan as bench.py (N_ITERS batches inside one
jit, per-step token variation, host-fetch sync). The int8 build follows the
CLI pattern — full bf16 tree on device, then
`quantize_decoder_params(free_source=True)`, which frees each float kernel
as its int8 copy lands (layer-sized fp32 temps) so the full-size tree
quantizes within one chip's HBM.

Usage: python tools/bench_6b.py [bf16|int8|both(default)|ce] [batch] [gptj|bloom7b1]

Also covers BLOOM-7.1B (SGPT-BLOOM-7.1B-msmarco, the other flagship BE):
ALiBi attention, 250k vocab; measured weights 13.17 GiB bf16 / 7.55 GiB int8.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import model_flops_per_seq

SEQ, N_ITERS = 304, 4


def make_cfg(model: str):
    import jax
    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)
    _guard.require_tpu(jax)
    import jax.numpy as jnp
    from sgpt_tpu.models import bloom, gpt_j_6b

    base = gpt_j_6b() if model == "gptj" else bloom("7b1")
    return base.replace(dtype=jnp.bfloat16, matmul_precision="default",
                        fused_attention=jax.default_backend() == "tpu")


def build_params(cfg, quantize: bool):
    import jax
    from sgpt_tpu.models import init_params
    from sgpt_tpu.ops.quant import quantize_decoder_params

    params = init_params(cfg, jax.random.key(0))
    if quantize:
        # free_source: we own this tree, and in-place freeing keeps peak
        # HBM at float-total + one layer slab during quantization
        params = quantize_decoder_params(params, free_source=True)
    jax.block_until_ready(params)
    return params


def param_bytes(params) -> int:
    import jax
    return sum(x.nbytes for x in jax.tree_util.tree_leaves(params))


def bench(mode: str, batch: int, model: str = "gptj") -> dict:
    import jax
    import jax.numpy as jnp
    from sgpt_tpu.models.decoder import forward
    from sgpt_tpu.ops.pooling import weighted_mean_pool, normalize

    cfg = make_cfg(model)
    t0 = time.perf_counter()
    params = build_params(cfg, quantize=(mode == "int8"))
    build_s = time.perf_counter() - t0
    weight_gb = param_bytes(params) / 2**30

    rng = np.random.default_rng(0)
    base_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, SEQ)),
                           jnp.int32)
    mask_np = np.ones((batch, SEQ), np.int32)
    for i in range(batch):
        mask_np[i, SEQ - rng.integers(0, SEQ // 10):] = 0
    mask = jnp.asarray(mask_np)

    @jax.jit
    def embed_many(params, base_ids, mask):
        def step(acc, i):
            ids = (base_ids + i) % cfg.vocab_size
            h = forward(params, ids, mask, cfg)
            emb = normalize(weighted_mean_pool(h, mask))
            return acc + jnp.sum(emb.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(N_ITERS, dtype=jnp.int32))
        return acc

    float(embed_many(params, base_ids, mask))   # compile + warm
    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        checksum = float(embed_many(params, base_ids + rep + 1, mask))
        dt = time.perf_counter() - t0
        assert np.isfinite(checksum)
        best = max(best, N_ITERS * batch / dt)
    flops = model_flops_per_seq(cfg, SEQ)
    del params
    gc.collect()
    return {"metric": f"{model}_encode_{mode}", "batch": batch, "seq": SEQ,
            "weight_gb": round(weight_gb, 2), "build_s": round(build_s, 1),
            "value": round(best, 2), "unit": "emb/s",
            "achieved_tflops": round(best * flops / 1e12, 1)}


def bench_ce(mode: str, batch: int, model: str = "gptj") -> dict:
    """SGPT-CE-6.1B IS GPT-J — the reference's zero-shot reranker needed
    device_map sharding for it. Pairs/s through the gathered scorer
    (T=304 prompt+doc window, C=16 continuation positions)."""
    import jax
    import jax.numpy as jnp
    from sgpt_tpu.ops.logprobs import continuation_scores_gathered

    cfg = make_cfg(model)
    params = build_params(cfg, quantize=(mode == "int8"))
    weight_gb = param_bytes(params) / 2**30

    C = 16
    rng = np.random.default_rng(0)
    base_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, SEQ)),
                           jnp.int32)
    amask = jnp.ones((batch, SEQ), jnp.int32)
    cpos = jnp.asarray(
        np.tile(np.arange(SEQ - C - 1, SEQ - 1), (batch, 1)), jnp.int32)
    ctgt = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, C)), jnp.int32)
    cmask = jnp.ones((batch, C), jnp.float32)

    @jax.jit
    def score_many(params, base_ids):
        def step(acc, i):
            s = continuation_scores_gathered(
                params, (base_ids + i) % cfg.vocab_size, amask,
                cpos, ctgt, cmask, cfg)
            return acc + jnp.sum(s), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(N_ITERS, dtype=jnp.int32))
        return acc

    float(score_many(params, base_ids))
    best = 0.0
    for rep in range(3):
        t0 = time.perf_counter()
        checksum = float(score_many(params, base_ids + rep + 1))
        dt = time.perf_counter() - t0
        assert np.isfinite(checksum)
        best = max(best, N_ITERS * batch / dt)
    del params                  # free before the next mode's bf16 build
    gc.collect()
    return {"metric": f"{model}_ce_{mode}", "batch": batch, "seq": SEQ,
            "cont": C, "weight_gb": round(weight_gb, 2),
            "value": round(best, 2), "unit": "pairs/s"}


def bench_train(batch: int, model: str = "gptj", chunk: int = 4,
                seq: int = 75, iters: int = 2) -> dict:
    """BitFit + GradCache contrastive training of the FLAGSHIP on one chip.

    The reference's headline training run needs 8xA100-40GB for 5.8B BitFit
    (train_bloom7b1.slurm; 'bs 128/GPU at chunk-4 memory',
    biencoder/nli_msmarco/README.md:193-196). Here: bf16 params (12.2 GB),
    AdamW state only on bias leaves (BitFit — a few MB), GradCache chunked
    encode at `chunk` sequences per pass, full optimizer steps. seq 75 is
    the NLI training length."""
    import jax
    import jax.numpy as jnp
    import optax
    from sgpt_tpu.losses import mnrl_loss
    from sgpt_tpu.models.decoder import forward
    from sgpt_tpu.ops.pooling import weighted_mean_pool
    from sgpt_tpu.training.bitfit import masked_optimizer
    from sgpt_tpu.training.gradcache import chunk_tree, gradcache_value_and_grad

    cfg = make_cfg(model)
    params = build_params(cfg, quantize=False)
    weight_gb = param_bytes(params) / 2**30

    opt = masked_optimizer(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4)), params)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    ids_a = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, seq)), jnp.int32)
    ids_p = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, seq)), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)

    def encode(p, c):
        return weighted_mean_pool(forward(p, c["ids"], c["mask"], cfg), c["mask"])

    vg = gradcache_value_and_grad(encode, mnrl_loss)

    @jax.jit
    def train_many(params, opt_state, ids_a, ids_p):
        def step(carry, i):
            params, opt_state = carry
            ta = chunk_tree({"ids": (ids_a + i) % cfg.vocab_size, "mask": mask},
                            chunk)
            tp = chunk_tree({"ids": (ids_p + i) % cfg.vocab_size, "mask": mask},
                            chunk)
            loss, grads = vg(params, ta, tp)
            updates, opt_state = opt.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), jnp.arange(iters, dtype=jnp.int32))
        return losses[-1]

    float(train_many(params, opt_state, ids_a, ids_p))   # compile + warm
    best = 0.0
    for rep in range(2):
        t0 = time.perf_counter()
        final_loss = float(train_many(params, opt_state,
                                      ids_a + rep + 1, ids_p + rep + 1))
        dt = time.perf_counter() - t0
        assert np.isfinite(final_loss)
        best = max(best, iters * batch / dt)
    return {"metric": f"{model}_bitfit_gradcache_train", "batch": batch,
            "chunk": chunk, "seq": seq, "weight_gb": round(weight_gb, 2),
            "value": round(best, 2), "unit": "ex/s"}


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    model = sys.argv[3] if len(sys.argv) > 3 else "gptj"
    if mode == "ce":
        for m in ("bf16", "int8"):
            print(json.dumps(bench_ce(m, batch, model)), flush=True)
    elif mode == "train":
        print(json.dumps(bench_train(batch, model)), flush=True)
    else:
        for m in (("bf16", "int8") if mode == "both" else (mode,)):
            print(json.dumps(bench(m, batch, model)), flush=True)
