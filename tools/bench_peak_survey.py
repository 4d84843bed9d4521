"""Decide the MFU denominator: one-sitting survey of matmul-peak harnesses.

VERDICT r4 weak #1: docs/PERF.md carried GPT-J-6B encode at 160.7 TF/s while
the MFU denominator used everywhere else — a DEPENDENT 8192^3 bf16 chain —
measured 134-139 TF/s in its own sittings. A forward cannot beat the device's
true dense peak, so one of the two methodologies is biased, and the shared
tile's run-to-run swing (83-162 TF/s observed across sittings) means ONLY
same-process, interleaved measurements can attribute the gap.

This harness times, interleaved in ONE process (3 rounds, max per method):

  dep8192:   the bench.py dependent chain (c = c @ b, 16 steps) — serializes
             steps and round-trips the (N, N) bf16 product through HBM twice
             per step.
  indep8192: independent per-step operands ((a+i) @ b), reduced by a matvec
             epilogue (out @ ones — 2N^2 FLOPs, negligible, and it needs every
             element so nothing dead-codes). Steps can pipeline.
  model6b:   the 6B encode's own projection shapes — (B*T, 4096) @ (4096,
             4096/16384) scan over 28 layers' q/k/v/o/up/down matmuls with
             independent operands per layer. This is the shape family the
             flagship number comes from.
  model125m: the same chain at the 125M encode's shapes — (512*304, 768) @
             (768, 768/3072), 12 layers. Answers how much of the 125M
             encode's MFU gap (0.65 vs the 6B-shaped 180 TF/s peak) is
             intrinsic to D=768 matmul geometry vs left on the table by
             the forward: the encode's achieved TF/s should be read
             against THIS ceiling for shape-bound utilization. (bench.py's
             MFU denominator stays max(dep8192, model6b) — one documented
             device peak, not per-row shape shopping.)

plus `python tools/bench_6b.py`'s exact embed_many for GPT-J (optional:
--with-6b, needs ~11 GB HBM) so the 6B TF/s and its denominator share the
sitting.

Anti-memoization rules are bench.py's: per-step operand variation inside one
jit, host-fetch sync, first measurement discarded.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--size", type=int, default=8192)
    ap.add_argument("--with-6b", action="store_true",
                    help="also run the GPT-J-6B encode in the same sitting")
    args = ap.parse_args()

    import jax
    import _guard  # noqa: E402

    _guard.require_tpu(jax)
    import jax.numpy as jnp

    N, K = args.size, args.iters
    a = jax.random.normal(jax.random.key(0), (N, N), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (N, N), jnp.bfloat16)
    ones = jnp.ones((N,), jnp.bfloat16)

    @jax.jit
    def dep(a, b):
        def step(c, _):
            return c @ b, None
        c, _ = jax.lax.scan(step, a, None, length=K)
        return jnp.sum(c.astype(jnp.float32))

    @jax.jit
    def indep(a, b):
        def step(acc, i):
            out = (a * (1 + i / 256).astype(jnp.bfloat16)) @ b
            # matvec epilogue: needs EVERY element of out (no dead code),
            # costs 2N^2 FLOPs (~1/4096 of the matmul) and fuses on-chip
            return acc + jnp.sum((out @ ones).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(K, dtype=jnp.float32))
        return acc

    # 6B projection shapes at the bench_6b geometry: B=32, T=304 -> M=9728
    M, D, F = 32 * 304, 4096, 16384
    L6 = 28
    x = jax.random.normal(jax.random.key(2), (M, D), jnp.bfloat16)
    wq = jax.random.normal(jax.random.key(3), (4, D, D), jnp.bfloat16)
    wu = jax.random.normal(jax.random.key(4), (D, F), jnp.bfloat16)
    wd = jax.random.normal(jax.random.key(5), (F, D), jnp.bfloat16)
    onesd = jnp.ones((D,), jnp.bfloat16)
    flops_6b_layer = 2 * M * D * D * 4 + 2 * M * D * F * 2

    @jax.jit
    def model6b(x, wq, wu, wd):
        def step(acc, i):
            xi = x * (1 + i / 256).astype(jnp.bfloat16)
            s = jnp.float32(0)
            for j in range(4):                      # q/k/v/o-shaped
                s = s + jnp.sum((xi @ wq[j] @ onesd).astype(jnp.float32))
            h = xi @ wu                             # up
            s = s + jnp.sum((h @ wd @ onesd).astype(jnp.float32))  # down
            return acc + s, None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(L6, dtype=jnp.float32))
        return acc

    # 125M projection shapes at the bench.py geometry: B=512, T=304
    M1, D1, F1, L1 = 512 * 304, 768, 3072, 12
    x1 = jax.random.normal(jax.random.key(6), (M1, D1), jnp.bfloat16)
    wq1 = jax.random.normal(jax.random.key(7), (4, D1, D1), jnp.bfloat16)
    wu1 = jax.random.normal(jax.random.key(8), (D1, F1), jnp.bfloat16)
    wd1 = jax.random.normal(jax.random.key(9), (F1, D1), jnp.bfloat16)
    onesd1 = jnp.ones((D1,), jnp.bfloat16)
    flops_125m_layer = 2 * M1 * D1 * D1 * 4 + 2 * M1 * D1 * F1 * 2

    @jax.jit
    def model125m(x, wq, wu, wd):
        def step(acc, i):
            xi = x * (1 + i / 256).astype(jnp.bfloat16)
            s = jnp.float32(0)
            for j in range(4):
                s = s + jnp.sum((xi @ wq[j] @ onesd1).astype(jnp.float32))
            h = xi @ wu
            s = s + jnp.sum((h @ wd @ onesd1).astype(jnp.float32))
            return acc + s, None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(L1, dtype=jnp.float32))
        return acc

    def timed(name, fn, ops, *xs):
        float(fn(*xs))  # compile + warm (first measurement discarded)
        t0 = time.perf_counter()
        assert np.isfinite(float(fn(*xs)))
        tf = ops / (time.perf_counter() - t0) / 1e12
        print(f"  {name}: {tf:.1f} TF/s", file=sys.stderr, flush=True)
        return tf

    print("backend up; measuring", file=sys.stderr, flush=True)
    flops_sq = 2.0 * N**3 * K
    rows = {"dep8192": [], "indep8192": [], "model6b": [], "model125m": []}
    for _ in range(args.rounds):
        rows["dep8192"].append(timed("dep8192", dep, flops_sq, a, b))
        rows["indep8192"].append(timed("indep8192", indep, flops_sq, a, b))
        rows["model6b"].append(timed("model6b", model6b,
                                     flops_6b_layer * L6, x, wq, wu, wd))
        rows["model125m"].append(timed("model125m", model125m,
                                       flops_125m_layer * L1,
                                       x1, wq1, wu1, wd1))
    out = {k: {"max": round(max(v), 1),
               "all": [round(x, 1) for x in v]} for k, v in rows.items()}
    print(json.dumps(out), flush=True)

    if args.with_6b:
        del a, b, x, wq, wu, wd, x1, wq1, wu1, wd1
        import gc
        gc.collect()
        from bench_6b import bench  # same-dir import when run as a script
        r = bench("bf16", 32, "gptj")
        r["same_sitting_peaks"] = {k: out[k]["max"] for k in out}
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
