"""Benchmark: embeddings/sec/chip on the flagship SGPT bi-encoder forward.

Prints ONE JSON line:
    {"metric": "embeddings_per_sec_per_chip", "value": N, "unit": "emb/s",
     "vs_baseline": N}

Setup mirrors the reference's BEIR encode hot loop
(biencoder/beir/beir_dense_retriever.py:225-306): GPT-Neo-125M architecture,
sequence length 300 (the BEIR/specb training length, --maxseqlen 300), ~10%
padding, position-weighted mean pooling + L2 normalize. Ours runs bf16 with the
pooling fused on device; the reference runs fp16 torch with a full hidden-state
D2H copy per batch.

Baseline: the reference publishes NO throughput numbers (SURVEY.md §6). The
denominator below is a computed reference point: an A100-80GB running the
reference's encode loop at 125M/seq-300 sustains ~2000 emb/s at realistic MFU
(2·125e6·300 FLOPs/seq ≈ 75 GFLOP ⇒ 312 TF/s bf16 × ~50% util ≈ 2000 seq/s),
before its D2H-copy overhead. vs_baseline = ours / 2000.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_EMB_PER_SEC = 2000.0
BATCH, SEQ = 32, 304  # 304 = 300 rounded up to sublane multiple


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sgpt_tpu.models import gpt_neo, init_params, cast_params
    from sgpt_tpu.models.decoder import forward
    from sgpt_tpu.ops.pooling import weighted_mean_pool, normalize

    cfg = gpt_neo("125m").replace(dtype=jnp.bfloat16, matmul_precision="default")
    params = cast_params(init_params(cfg, jax.random.key(0)), jnp.bfloat16)

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (BATCH, SEQ)), jnp.int32)
    mask_np = np.ones((BATCH, SEQ), np.int32)
    for i in range(BATCH):  # ~10% right padding, like real length-bucketed batches
        mask_np[i, SEQ - rng.integers(0, SEQ // 10):] = 0
    mask = jnp.asarray(mask_np)

    @jax.jit
    def embed(params, ids, mask):
        h = forward(params, ids, mask, cfg)
        return normalize(weighted_mean_pool(h, mask))

    # warmup/compile
    embed(params, ids, mask).block_until_ready()

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = embed(params, ids, mask)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    emb_per_sec = n_iters * BATCH / dt
    print(json.dumps({
        "metric": "embeddings_per_sec_per_chip",
        "value": round(emb_per_sec, 1),
        "unit": "emb/s",
        "vs_baseline": round(emb_per_sec / BASELINE_EMB_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
