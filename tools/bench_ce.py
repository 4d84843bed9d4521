"""Cross-encoder scoring throughput: (query, doc) pairs/sec/chip.

The SGPT-CE hot path (ops/logprobs.continuation_scores — the sgptce.py:150-262
equivalent): decoder forward + LM head + log_softmax + continuation gather/sum,
all fused in one jit. GPT-Neo-125M architecture, seq 256 (prompt G + ~210-token
doc + query continuation), bf16.

Cache-proof methodology as bench.py: N_ITERS batches inside one lax.scan with
per-step varying ids, timed to a host fetch.

Prints one JSON line per batch size.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

SEQ, N_ITERS = 256, 8


def bench(batch: int, quantize: bool = False) -> dict:
    import jax
    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)
    _guard.require_tpu(jax)
    import jax.numpy as jnp

    from sgpt_tpu.models import gpt_neo, init_params, cast_params
    from sgpt_tpu.ops.logprobs import continuation_scores_gathered

    cfg = gpt_neo("125m").replace(dtype=jnp.bfloat16, matmul_precision="default",
                                  fused_attention=jax.default_backend() == "tpu")
    params = cast_params(init_params(cfg, jax.random.key(0)), jnp.bfloat16)
    if quantize:
        from sgpt_tpu.ops.quant import quantize_decoder_params
        params = quantize_decoder_params(params)

    rng = np.random.default_rng(0)
    base_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, SEQ)), jnp.int32)
    mask = jnp.ones((batch, SEQ), jnp.int32)
    # ~12-token continuations (typical BEIR query length) in a C=16 window —
    # the production path (crossencoder.score_pairs) uses the gathered scorer
    C = 16
    cpos = jnp.asarray(np.tile(np.arange(SEQ - C, SEQ), (batch, 1)), jnp.int32)
    ctgt = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, C)), jnp.int32)
    cm = np.zeros((batch, C), np.float32)
    cm[:, -12:] = 1.0
    cmask = jnp.asarray(cm)

    @jax.jit
    def score_many(params, base_ids):
        def step(acc, i):
            ids = (base_ids + i) % cfg.vocab_size
            s = continuation_scores_gathered(params, ids, mask, cpos, ctgt,
                                             cmask, cfg)
            return acc + jnp.sum(s), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(N_ITERS, dtype=jnp.int32))
        return acc

    float(score_many(params, base_ids))
    t0 = time.perf_counter()
    checksum = float(score_many(params, base_ids + 1))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return {"metric": "ce_pairs_per_sec_per_chip", "batch": batch, "seq": SEQ,
            "quantize": "int8" if quantize else None,
            "value": round(N_ITERS * batch / dt, 1), "unit": "pairs/s"}


if __name__ == "__main__":
    import sys
    quantize = "--quantize" in sys.argv
    for b in (64, 128, 256):
        print(json.dumps(bench(b, quantize=quantize)), flush=True)
