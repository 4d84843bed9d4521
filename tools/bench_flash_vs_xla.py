"""Flash (Pallas) vs XLA attention in the full encode path, honest timing.

The BEIR bucket is 304 (not flash-legal); flash runs at the nearest legal
bucket 384. The question: does flash-at-384 beat XLA-at-304 per *text* once
the batch is large enough that the fp32 (B,H,T,T) score traffic dominates?
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def bench(batch: int, seq: int, use_flash: bool, iters: int = 8) -> dict:
    import jax
    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)
    _guard.require_tpu(jax)
    import jax.numpy as jnp

    from sgpt_tpu.models import gpt_neo, init_params, cast_params
    from sgpt_tpu.models.decoder import forward
    from sgpt_tpu.ops.pooling import weighted_mean_pool, normalize

    cfg = gpt_neo("125m").replace(dtype=jnp.bfloat16, matmul_precision="default",
                                  use_flash=use_flash)
    params = cast_params(init_params(cfg, jax.random.key(0)), jnp.bfloat16)

    rng = np.random.default_rng(0)
    base_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, seq)), jnp.int32)
    mask_np = np.ones((batch, seq), np.int32)
    for i in range(batch):
        # simulate ~290-token texts: flash pads 290->384, xla 290->304
        mask_np[i, 290 - rng.integers(0, 20):] = 0
    mask = jnp.asarray(mask_np)

    @jax.jit
    def embed_many(params, base_ids, mask):
        def step(acc, i):
            ids = (base_ids + i) % cfg.vocab_size
            h = forward(params, ids, mask, cfg)
            emb = normalize(weighted_mean_pool(h, mask))
            return acc + jnp.sum(emb.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(iters, dtype=jnp.int32))
        return acc

    float(embed_many(params, base_ids, mask))
    t0 = time.perf_counter()
    checksum = float(embed_many(params, base_ids + 1, mask))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return {"attn": "flash" if use_flash else "xla", "batch": batch, "seq": seq,
            "emb_per_sec": round(iters * batch / dt, 1)}


if __name__ == "__main__":
    for batch in (64, 128, 256):
        print(json.dumps(bench(batch, 304, False)), flush=True)
        print(json.dumps(bench(batch, 384, True)), flush=True)
