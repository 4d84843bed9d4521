"""Benchmark: embeddings/sec/chip on the flagship SGPT bi-encoder forward.

Prints ONE JSON line:
    {"metric": "embeddings_per_sec_per_chip", "value": N, "unit": "emb/s",
     "vs_baseline": N}

Setup mirrors the reference's BEIR encode hot loop
(biencoder/beir/beir_dense_retriever.py:225-306): GPT-Neo-125M architecture,
sequence length 304 (the BEIR/specb training length rounded to sublane), ~10%
padding, position-weighted mean pooling + L2 normalize, bf16. Ours fuses the
pooling on device; the reference round-trips hidden states to host per batch.

Measurement is dispatch/cache-proof: N_ITERS batches run inside ONE jit via
lax.scan with per-step varying token ids, and the timing ends on a host fetch
of the result checksum — remote-execution layers can neither memoize repeated
identical dispatches nor acknowledge before the chain completes.

Baseline: the reference publishes NO throughput numbers (SURVEY.md §6). The
denominator is a computed reference point for the reference implementation on
an A100-80GB at 125M/seq-304 (2·125e6·304 ≈ 76 GFLOP/seq, 312 TF/s bf16 at
~50% util ⇒ ~2000 emb/s). vs_baseline = ours / 2000 — on a full v5e chip
(197 TF/s) parity needs ~65% MFU; on a fractional dev tile the absolute value
scales with the tile's FLOP share.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_EMB_PER_SEC = 2000.0
BATCH, SEQ, N_ITERS = 32, 304, 8


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sgpt_tpu.models import gpt_neo, init_params, cast_params
    from sgpt_tpu.models.decoder import forward
    from sgpt_tpu.ops.pooling import weighted_mean_pool, normalize

    cfg = gpt_neo("125m").replace(dtype=jnp.bfloat16, matmul_precision="default")
    params = cast_params(init_params(cfg, jax.random.key(0)), jnp.bfloat16)

    rng = np.random.default_rng(0)
    base_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (BATCH, SEQ)), jnp.int32)
    mask_np = np.ones((BATCH, SEQ), np.int32)
    for i in range(BATCH):  # ~10% right padding, like real length-bucketed batches
        mask_np[i, SEQ - rng.integers(0, SEQ // 10):] = 0
    mask = jnp.asarray(mask_np)

    @jax.jit
    def embed_many(params, base_ids, mask):
        def step(acc, i):
            ids = (base_ids + i) % cfg.vocab_size  # vary tokens per iteration
            h = forward(params, ids, mask, cfg)
            emb = normalize(weighted_mean_pool(h, mask))
            return acc + jnp.sum(emb.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(N_ITERS, dtype=jnp.int32))
        return acc

    # compile + warm
    float(embed_many(params, base_ids, mask))

    t0 = time.perf_counter()
    checksum = float(embed_many(params, base_ids + 1, mask))  # host fetch = sync
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)

    emb_per_sec = N_ITERS * BATCH / dt
    print(json.dumps({
        "metric": "embeddings_per_sec_per_chip",
        "value": round(emb_per_sec, 1),
        "unit": "emb/s",
        "vs_baseline": round(emb_per_sec / BASELINE_EMB_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
