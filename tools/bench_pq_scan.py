"""Which ADC (asymmetric distance computation) formulation is fastest on TPU?

Product quantization stores each doc as M uint8 codes (one per D/M-dim
subspace); search scores a doc as sum_m LUT[m, code[n, m]] where the LUT is
the query's dot product with the M x 256 subspace centroids. The LUT gather
is PQ's classic hot op — SIMD CPUs shuffle 4-bit tables in registers; TPUs
have no shuffle, so the formulation choice decides whether PQ is viable at
all here. Candidates measured on the real chip:

  lut         out[q,n] = sum_m T[q, m, codes[n,m]]    — XLA gather over the
              (M, 256) table, slab-scanned so the (Q, S, M) intermediate
              stays bounded.
  reconstruct xhat[n] = concat_m C[m, codes[n,m]]; out = q @ xhat.T — gather
              with a CONTIGUOUS ds-wide minor dim (vectorizable), then one
              dense bf16 matmul on the MXU.
  onehot      out = einsum('qmk,smk->qs', T, onehot(codes)) — all-MXU, but
              inflates the code bytes 256x in VMEM traffic.
  onehot4     FAISS-fastscan-shaped 4-bit variant: 2x the subspaces (ds/2),
              16 centroids each — same 96 B/doc, one-hot inflation only 16x
              (M'·16 = 3072 effective dim vs 24576 for 8-bit).

All formulations share the methodology of bench.py: the whole corpus scan
runs inside ONE jit (lax.scan over slabs with a running top-k merge), timing
ends on a host fetch of a checksum, operands vary per rep so a remote relay
can neither memoize nor early-ack. Per-doc bytes: codes M=96 uint8 vs the
int8 exact scan's 768 — an 8x bandwidth and HBM-capacity advantage IF the
gather can run anywhere near bandwidth.

Usage: python tools/bench_pq_scan.py [--n 1048576] [--m 96] [--q 8]
"""
from __future__ import annotations

import argparse
import time

import numpy as np

import _guard


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--m", type=int, default=96)
    ap.add_argument("--q", type=int, default=8)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--slab", type=int, default=1 << 15)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    _guard.require_tpu(jax)
    N, D, M, Q, K = args.n, args.d, args.m, args.q, args.k
    ds = D // M
    S = args.slab
    assert N % S == 0
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 256, (N, M), np.uint8))
    cent = jnp.asarray(rng.standard_normal((M, 256, ds), np.float32) / np.sqrt(D),
                       jnp.bfloat16)
    qv = jnp.asarray(rng.standard_normal((Q, M, ds), np.float32), jnp.bfloat16)

    def lut_tables(qv):
        # (Q, M, 256) fp32 — tiny (Q*M*256*4 = 786 KB at defaults)
        return jnp.einsum("qmd,mkd->qmk", qv, cent,
                          preferred_element_type=jnp.float32)

    def scan_slabs(score_slab, qv):
        """Shared harness: scan N/S slabs, running top-k merge, checksum."""
        tiles = codes.reshape(N // S, S, M)

        def step(carry, tile):
            run = carry
            scores = score_slab(qv, tile)          # (Q, S) fp32
            t_vals, _ = jax.lax.top_k(scores, K)
            vals = jnp.concatenate([run, t_vals], axis=1)
            run, _ = jax.lax.top_k(vals, K)
            return run, None

        init = jnp.full((Q, K), -jnp.inf, jnp.float32)
        vals, _ = jax.lax.scan(step, init, tiles)
        return jnp.sum(vals)

    midx = jnp.arange(M, dtype=jnp.int32)

    def score_lut(qv, tile):
        T = lut_tables(qv)
        # out[q,s,m] = T[q, m, tile[s, m]]
        def one_q(Tq):
            return Tq[midx[None, :], tile.astype(jnp.int32)].sum(-1)
        return jax.vmap(one_q)(T)

    def score_reconstruct(qv, tile):
        xhat = cent[midx[None, :], tile.astype(jnp.int32)]   # (S, M, ds)
        return jnp.einsum("qmd,smd->qs", qv, xhat,
                          preferred_element_type=jnp.float32)

    def score_onehot(qv, tile):
        T = lut_tables(qv).astype(jnp.bfloat16)
        oh = (tile[:, :, None] == jnp.arange(256, dtype=jnp.uint8)
              ).astype(jnp.bfloat16)                          # (S, M, 256)
        return jnp.einsum("qmk,smk->qs", T, oh,
                          preferred_element_type=jnp.float32)

    # 4-bit variant: M2 = 2M subspaces of ds/2 dims, 16 centroids each —
    # identical bytes/doc. Codes here are random like the 8-bit ones; only
    # the ADC shape matters for the formulation race.
    M2 = 2 * M
    codes4 = jnp.asarray(rng.integers(0, 16, (N, M2), np.uint8))
    cent4 = jnp.asarray(rng.standard_normal((M2, 16, ds // 2), np.float32)
                        / np.sqrt(D), jnp.bfloat16)
    qv4 = jnp.asarray(rng.standard_normal((Q, M2, ds // 2), np.float32),
                      jnp.bfloat16)

    def score_onehot4(q4, tile):
        T = jnp.einsum("qmd,mkd->qmk", q4, cent4,
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        oh = (tile[:, :, None] == jnp.arange(16, dtype=jnp.uint8)
              ).astype(jnp.bfloat16)                          # (S, M2, 16)
        return jnp.einsum("qmk,smk->qs", T, oh,
                          preferred_element_type=jnp.float32)

    def scan_slabs4(q4):
        tiles = codes4.reshape(N // S, S, M2)

        def step(carry, tile):
            scores = score_onehot4(q4, tile)
            t_vals, _ = jax.lax.top_k(scores, K)
            vals = jnp.concatenate([carry, t_vals], axis=1)
            carry, _ = jax.lax.top_k(vals, K)
            return carry, None

        init = jnp.full((Q, K), -jnp.inf, jnp.float32)
        vals, _ = jax.lax.scan(step, init, tiles)
        return jnp.sum(vals)

    results = {}
    for name, fn in [("lut", score_lut), ("reconstruct", score_reconstruct),
                     ("onehot", score_onehot), ("onehot4", None)]:
        if name == "onehot4":
            run = jax.jit(scan_slabs4)
        else:
            run = jax.jit(lambda qv, fn=fn: scan_slabs(fn, qv))
        try:
            float(run(qv))  # compile + warm
        except Exception as e:  # pragma: no cover - diagnostic path
            print(f"{name:12s}  FAILED: {type(e).__name__}: {e}")
            continue
        best = float("inf")
        for rep in range(args.reps):
            qr = qv * jnp.bfloat16(1 + rep / 64)   # anti-memoization
            t0 = time.perf_counter()
            chk = float(run(qr))
            dt = time.perf_counter() - t0
            assert np.isfinite(chk)
            best = min(best, dt)
        code_gb = N * M / 1e9
        results[name] = best
        print(f"{name:12s}  {best*1e3:8.2f} ms  "
              f"({best/Q*1e3:6.2f} ms/query-batch-row, "
              f"{code_gb/best:6.1f} GB/s over codes)")

    if results:
        winner = min(results, key=results.get)
        print(f"winner: {winner}  (N={N}, M={M}, Q={Q}, K={K}, slab={S})")


if __name__ == "__main__":
    main()
