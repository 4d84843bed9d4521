"""Backend guard for the bench tools.

The axon TPU relay is single-client: if another process holds the TPU, JAX
silently falls back to the CPU backend and a "TPU bench" runs ~2 orders of
magnitude slow, reporting garbage numbers without erroring. Every TPU bench
calls require_tpu() right after its first jax import so that failure mode
exits loudly instead. BENCH_ALLOW_CPU=1 overrides (for smoke-testing the
tools themselves on CPU-only boxes).
"""
import os
import sys


def require_tpu(jax):
    backend = jax.default_backend()
    if backend == "tpu" or os.environ.get("BENCH_ALLOW_CPU") == "1":
        return
    sys.exit(f"bench: jax backend is {backend!r}, not 'tpu' — the TPU relay "
             "is busy (it is single-client) or unavailable. Free it and "
             "re-run, or set BENCH_ALLOW_CPU=1 to measure on CPU anyway.")
