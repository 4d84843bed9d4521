"""Measure this device's achievable dense bf16 matmul FLOP/s (the MFU
denominator for bench.py). Cache-proof: K chained matmuls inside one jit with
per-step variation, timed to a host fetch of a checksum.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def measure_peak_tflops(size: int = 4096, iters: int = 32) -> float:
    import jax
    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)
    _guard.require_tpu(jax)
    import jax.numpy as jnp

    k0 = jax.random.key(0)
    a = jax.random.normal(k0, (size, size), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (size, size), jnp.bfloat16)

    @jax.jit
    def chain(a, b):
        def step(acc, i):
            # vary the operand each step so no layer can memoize
            out = (a + i.astype(jnp.bfloat16)) @ b
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(iters, dtype=jnp.int32))
        return acc

    float(chain(a, b))  # compile + warm
    t0 = time.perf_counter()
    checksum = float(chain(a, b))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    flops = 2.0 * size * size * size * iters
    return flops / dt / 1e12


if __name__ == "__main__":
    for size in (2048, 4096, 8192):
        tf = measure_peak_tflops(size)
        print(json.dumps({"matmul_size": size, "tflops": round(tf, 1)}))
