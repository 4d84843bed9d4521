"""Benchmark: embeddings/sec/chip on the flagship SGPT bi-encoder forward.

Prints ONE JSON line:
    {"metric": "embeddings_per_sec_per_chip", "value": N, "unit": "emb/s",
     "vs_baseline": N, "mfu": N, "tile_peak_tflops": N, "achieved_tflops": N}

Setup mirrors the reference's BEIR encode hot loop
(biencoder/beir/beir_dense_retriever.py:225-306): GPT-Neo-125M architecture,
sequence length 304 (the BEIR/specb training length rounded to sublane), ~10%
padding, position-weighted mean pooling + L2 normalize, bf16. Ours fuses the
pooling on device; the reference round-trips hidden states to host per batch.

Attention runs through the fused short-T Pallas kernel
(ops/pallas/short_attention.py) on TPU backends: the (T, T) scores never
leave VMEM, which removed both ~55% of the XLA path's runtime and the old
batch-512 HBM spill cliff. Batch 512 is the new measured plateau
(tools/bench_encode_sweep.py with fused attention: 256→1516, 384→1706,
512→1825, 1024→1882 emb/s — the last within 0.3% of the same-sitting
measured matmul peak).

Measurement is dispatch/cache-proof: N_ITERS batches run inside ONE jit via
lax.scan with per-step varying token ids, and the timing ends on a host fetch
of the result checksum — remote-execution layers can neither memoize repeated
identical dispatches nor acknowledge before the chain completes. The model
rate is best-of-3 reps (the shared dev tile swings ±10% run to run).

MFU denominator: the max dense bf16 matmul rate demonstrated ON THIS DEVICE
at the same sitting, over TWO harnesses (r5 reconciliation —
tools/bench_peak_survey.py measured all candidates interleaved): a DEPENDENT
8192³ chain (119-138 TF/s) and a MODEL-SHAPED projection chain — the 6B
q/k/v/o/up/down matmul sequence at (M=9728, D=4096, F=16384) with
independent per-step operands — which runs at 178.5-179.7 TF/s, ~91% of a
full v5e's 197 TF/s spec and stable within 1% across rounds. The dependent
square chain UNDERSTATES the device peak ~23% (step serialization + two
134 MB HBM round-trips per step); the earlier MFU 0.85-0.88 rows derived
from it were correspondingly inflated, and GPT-J-6B's measured 160.7 TF/s
encode — "impossible" against the old 139 denominator — is simply a
~0.9-MFU forward against the real one. Model FLOPs are counted causally
(useful work), so mfu is achieved useful FLOP/s over what the tile
demonstrably can do.

Baseline: the reference publishes NO throughput numbers (SURVEY.md §6). The
denominator is a computed reference point for the reference implementation on
an A100-80GB at 125M/seq-304 (2·125e6·304 ≈ 76 GFLOP/seq, 312 TF/s bf16 at
~50% util ⇒ ~2000 emb/s). vs_baseline = ours / 2000.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_EMB_PER_SEC = 2000.0
BATCH, SEQ, N_ITERS = 512, 304, 8


def model_flops_per_seq(cfg, T: int) -> float:
    """Required dense decoder FLOPs for one sequence (2·MACs).

    Attention counted CAUSALLY (avg window (T+1)/2 keys per query), i.e.
    useful FLOPs — the fused kernel actually computes the full (T, T) score
    tile, but the masked half is waste, not achievement."""
    D, L = cfg.hidden_size, cfg.num_layers
    F = getattr(cfg, "intermediate_size", None) or 4 * D
    per_token = L * (8 * D * D + 4 * D * F + 4 * ((T + 1) // 2) * D)
    return float(per_token) * T


def measure_tile_peak_tflops(size: int = 8192, iters: int = 16) -> float:
    """Dense bf16 matmul rate this device achieves right now (MFU denominator).

    Max over TWO harnesses (see module docstring / tools/bench_peak_survey.py):
    the dependent square chain (kept for continuity with r2-r4 numbers) and
    the model-shaped projection chain that demonstrates the true peak."""
    import jax
    import jax.numpy as jnp

    a = jax.random.normal(jax.random.key(0), (size, size), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (size, size), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        # Each product feeds the next matmul: the consumption IS the next
        # step's operand read, so no elementwise/reduce HBM traffic dilutes
        # the measured rate (a dependent chain also can't be hoisted/fused).
        def step(c, _):
            return c @ b, None
        c, _ = jax.lax.scan(step, a, None, length=iters)
        return jnp.sum(c.astype(jnp.float32))

    # model-shaped: the 6B projection sequence (q/k/v/o at D=4096 + up/down
    # at F=16384, M = 32*304 activation rows), independent operands per
    # layer step, matvec epilogue (needs every output element; 2MN FLOPs,
    # ~1/4096 of the matmul). Weights stream once per step while the
    # activation tile stays hot — the regime real forwards run in, and the
    # highest-rate harness of the r5 survey (178-180 TF/s vs the square
    # chain's 119-138 on the same sitting).
    M, D, F, L = 32 * 304, 4096, 16384, 28
    x = jax.random.normal(jax.random.key(2), (M, D), jnp.bfloat16)
    wq = jax.random.normal(jax.random.key(3), (4, D, D), jnp.bfloat16)
    wu = jax.random.normal(jax.random.key(4), (D, F), jnp.bfloat16)
    wd = jax.random.normal(jax.random.key(5), (F, D), jnp.bfloat16)
    onesd = jnp.ones((D,), jnp.bfloat16)
    flops_model = (2 * M * D * D * 4 + 2 * M * D * F * 2) * L

    @jax.jit
    def model_chain(x, wq, wu, wd):
        def step(acc, i):
            xi = x * (1 + i / 256).astype(jnp.bfloat16)
            s = jnp.float32(0)
            for j in range(4):
                s = s + jnp.sum((xi @ wq[j] @ onesd).astype(jnp.float32))
            h = xi @ wu
            return acc + s + jnp.sum((h @ wd @ onesd).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(L, dtype=jnp.float32))
        return acc

    float(chain(a, b))  # compile + warm
    float(model_chain(x, wq, wu, wd))
    best = 0.0
    for rep in range(3):  # the shared tile's rate swings ±10% run to run
        # vary the operand per rep (same anti-memoization rule as the model
        # reps below): identical dispatches could be served from a remote
        # relay's cache in near-zero time and max() would pick that sample.
        # Multiplicative, not additive — a mean shift compounds through the
        # 16 dependent matmuls and overflows fp32 at this magnitude
        t0 = time.perf_counter()
        checksum = float(chain(a * jnp.bfloat16(1 + rep / 128), b))
        dt = time.perf_counter() - t0
        assert np.isfinite(checksum)
        best = max(best, 2.0 * size ** 3 * iters / dt / 1e12)
        t0 = time.perf_counter()
        checksum = float(model_chain(x * jnp.bfloat16(1 + rep / 128), wq, wu, wd))
        dt = time.perf_counter() - t0
        assert np.isfinite(checksum)
        best = max(best, flops_model / dt / 1e12)
    return best


def _require_backend(timeout_s: int = 180) -> None:
    """Fail fast instead of hanging the harness: backend init on the shared
    TPU relay can block INDEFINITELY when a crashed client wedged it
    (observed: 4+ hours). Initialize in a daemon thread with a deadline,
    and refuse to record CPU-fallback garbage numbers."""
    import os
    import sys
    import threading

    got: list = []
    err: list = []

    def probe():
        try:
            import jax
            got.append(jax.default_backend())
        except Exception as e:  # report the REAL failure, not a fake timeout
            err.append(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if err:
        sys.exit(f"bench: JAX backend failed to initialize: {err[0]!r}")
    if not got:
        sys.exit(f"bench: JAX backend failed to initialize within {timeout_s}s "
                 "— the TPU relay is unavailable or wedged; free/restart it "
                 "and re-run")
    if got[0] != "tpu" and os.environ.get("BENCH_ALLOW_CPU") != "1":
        sys.exit(f"bench: backend is {got[0]!r}, not 'tpu' — refusing to "
                 "record non-TPU numbers (BENCH_ALLOW_CPU=1 overrides)")


def main() -> None:
    _require_backend()
    import jax
    import jax.numpy as jnp

    from sgpt_tpu.models import gpt_neo, init_params, cast_params
    from sgpt_tpu.models.decoder import forward
    from sgpt_tpu.ops.pooling import weighted_mean_pool, normalize

    cfg = gpt_neo("125m").replace(dtype=jnp.bfloat16, matmul_precision="default",
                                  fused_attention=jax.default_backend() == "tpu")
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

    # The dev tile is SHARED: throughput swings run-to-run (observed 78-118
    # TF/s on the identical matmul chain minutes apart). Best-of-N on both
    # the model measurement and the peak denominator — and sample the peak
    # both before and after the model runs — so one unlucky co-scheduled
    # interval doesn't set the recorded number or push MFU past 1.
    peaks = [measure_tile_peak_tflops()]
    rates = []
    for rep in range(3):
        t0 = time.perf_counter()
        checksum = float(embed_many(params, base_ids + rep + 1, mask))  # host fetch = sync
        dt = time.perf_counter() - t0
        assert np.isfinite(checksum)
        rates.append(N_ITERS * BATCH / dt)
    peaks.append(measure_tile_peak_tflops())

    emb_per_sec = max(rates)
    achieved_tflops = emb_per_sec * model_flops_per_seq(cfg, SEQ) / 1e12
    peak_tflops = max(peaks)
    print(json.dumps({
        "metric": "embeddings_per_sec_per_chip",
        "value": round(emb_per_sec, 1),
        "unit": "emb/s",
        "vs_baseline": round(emb_per_sec / BASELINE_EMB_PER_SEC, 3),
        "achieved_tflops": round(achieved_tflops, 1),
        "tile_peak_tflops": round(peak_tflops, 1),
        "mfu": round(achieved_tflops / peak_tflops, 3),
    }))


if __name__ == "__main__":
    main()
