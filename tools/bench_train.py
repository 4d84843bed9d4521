"""GradCache contrastive train-step throughput: examples/sec/chip.

The reference's flagship big-batch path (GradCache chunked MNRL, 8xA100:
effective batch 128/GPU at chunk-4 memory, biencoder/nli_msmarco/
README.md:193-196). Here: GPT-Neo-125M, BitFit (bias-only AdamW), MNRL over
(anchor, positive) towers, global batch >= 256 split into chunks, seq 75
(the NLI training length).

Cache-proof: N_ITERS full optimizer steps inside one lax.scan (ids vary per
step), timed to a host fetch of the final loss.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEQ, N_ITERS = 75, 4


def bench(global_batch: int, chunk: int, seq: int = SEQ) -> dict:
    import jax
    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)
    _guard.require_tpu(jax)
    import jax.numpy as jnp
    import optax

    from sgpt_tpu.losses import mnrl_loss
    from sgpt_tpu.models import gpt_neo, init_params, cast_params
    from sgpt_tpu.models.decoder import forward
    from sgpt_tpu.ops.pooling import weighted_mean_pool
    from sgpt_tpu.training.bitfit import masked_optimizer
    from sgpt_tpu.training.gradcache import chunk_tree, gradcache_value_and_grad

    cfg = gpt_neo("125m").replace(dtype=jnp.bfloat16, matmul_precision="default",
                                  fused_attention=jax.default_backend() == "tpu")
    # the decoder gates the fused kernel to 160 <= T <= 512; report which
    # attention path this seq actually runs so the number isn't misread as
    # a fused-kernel measurement at e.g. the default NLI T=75
    fused_active = (cfg.fused_attention and 160 <= seq <= 512)
    params = cast_params(init_params(cfg, jax.random.key(0)), jnp.bfloat16)

    opt = masked_optimizer(
        optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4)), params)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    ids_a = jnp.asarray(rng.integers(0, cfg.vocab_size, (global_batch, seq)),
                        jnp.int32)
    ids_p = jnp.asarray(rng.integers(0, cfg.vocab_size, (global_batch, seq)),
                        jnp.int32)
    mask = jnp.ones((global_batch, seq), jnp.int32)

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
            step, (params, opt_state), jnp.arange(N_ITERS, dtype=jnp.int32))
        return losses[-1]

    float(train_many(params, opt_state, ids_a, ids_p))
    t0 = time.perf_counter()
    final_loss = float(train_many(params, opt_state, ids_a + 1, ids_p + 1))
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)
    return {"metric": "gradcache_train_examples_per_sec_per_chip",
            "global_batch": global_batch, "chunk": chunk, "seq": seq,
            "attention_path": "fused" if fused_active else "xla",
            "steps_per_sec": round(N_ITERS / dt, 3),
            "value": round(N_ITERS * global_batch / dt, 1), "unit": "ex/s"}


if __name__ == "__main__":
    seq = int(sys.argv[1]) if len(sys.argv) > 1 else SEQ
    for gb, ck in ((256, 32), (512, 64), (1024, 64)):
        print(json.dumps(bench(gb, ck, seq)), flush=True)
