"""Pallas streaming MIPS vs XLA blockmax: the promote-or-retire measurement.

1M docs x 768 dims bf16 (1.6 GB corpus), query batch 64. Each search must
read the full corpus once from HBM, so GB/s = corpus_bytes / latency measures
how close each kernel is to the bandwidth speed-of-light.

Cache-proof: N_ITERS searches inside one jit (queries vary per step), timed
to a host fetch.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

Q, D, N_ITERS = 64, 768, 8


def bench(kernel: str, n_docs: int, k: int) -> dict:
    import jax
    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)
    _guard.require_tpu(jax)
    import jax.numpy as jnp

    from sgpt_tpu.ops.topk import blockmax_topk
    from sgpt_tpu.ops.pallas.mips import mips_topk

    corpus = jax.random.normal(jax.random.key(0), (n_docs, D), jnp.bfloat16)
    queries = jax.random.normal(jax.random.key(1), (Q, D), jnp.bfloat16)

    if kernel == "blockmax":
        search = lambda q, c: blockmax_topk(q, c, n_docs, k=k)
    else:
        search = lambda q, c: mips_topk(q, c, n_docs, k=k, tile_n=2048)

    @jax.jit  # corpus is an explicit arg: closure capture would embed a
    def many(queries, corpus):  # 1.6 GB constant into the HLO
        def step(acc, i):
            vals, idx = search(queries + i.astype(jnp.bfloat16) * 1e-3, corpus)
            return acc + jnp.sum(vals) + jnp.sum(idx.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.arange(N_ITERS, dtype=jnp.int32))
        return acc

    float(many(queries, corpus))
    t0 = time.perf_counter()
    checksum = float(many(queries + 1, corpus))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    lat_ms = dt / N_ITERS * 1e3
    gbps = (n_docs * D * 2) / (dt / N_ITERS) / 1e9
    return {"kernel": kernel, "n_docs": n_docs, "k": k, "q_batch": Q,
            "latency_ms": round(lat_ms, 2), "corpus_scan_gbps": round(gbps, 1),
            "qps": round(Q / (dt / N_ITERS), 1)}


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    for kernel, k in (("blockmax", 10), ("pallas", 10), ("blockmax", 100)):
        print(json.dumps(bench(kernel, n, k)), flush=True)
