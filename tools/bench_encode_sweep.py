"""Sweep encode throughput over batch size (and optionally seq len) on the
current device, with the cache-proof scan methodology from bench.py.
Prints one JSON line per config with emb/s, achieved TF/s and MFU vs a
measured matmul peak.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import model_flops_per_seq  # single causal-FLOP formula (bench.py)


def bench_encode(batch: int, seq: int, iters: int = 8) -> dict:
    import jax
    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)
    _guard.require_tpu(jax)
    import jax.numpy as jnp

    from sgpt_tpu.models import gpt_neo, init_params, cast_params
    from sgpt_tpu.models.decoder import forward
    from sgpt_tpu.ops.pooling import weighted_mean_pool, normalize

    cfg = gpt_neo("125m").replace(dtype=jnp.bfloat16, matmul_precision="default")
    params = cast_params(init_params(cfg, jax.random.key(0)), jnp.bfloat16)

    rng = np.random.default_rng(0)
    base_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, seq)), jnp.int32)
    mask_np = np.ones((batch, seq), np.int32)
    for i in range(batch):
        mask_np[i, seq - rng.integers(0, seq // 10):] = 0
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

    emb_per_sec = iters * batch / dt
    tflops = emb_per_sec * model_flops_per_seq(cfg, seq) / 1e12
    return {"batch": batch, "seq": seq, "emb_per_sec": round(emb_per_sec, 1),
            "achieved_tflops": round(tflops, 1)}


if __name__ == "__main__":
    seq = int(sys.argv[1]) if len(sys.argv) > 1 else 304
    for batch in (32, 64, 128, 256):
        print(json.dumps(bench_encode(batch, seq)), flush=True)
