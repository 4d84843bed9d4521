"""Serving-latency benchmark: p50/p95 query latency over a synthetic corpus.

The north-star serving target (BASELINE.json): <50 ms p50 over 10M docs on a
v5p-8. This tool measures the DenseIndex query path (embed query batch → sharded
block-max top-k → ICI merge) on whatever devices are attached.

    python tools/bench_serving.py --ndocs 1000000 --dim 768 --k 10 --qbatch 8

Timing is cache-proof: every query batch differs, and each measurement ends on
a host fetch of the scores.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndocs", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--qbatch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dp", type=int, default=-1)
    args = ap.parse_args()

    import jax

    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)

    _guard.require_tpu(jax)
    import jax.numpy as jnp

    from sgpt_tpu.index import DenseIndex
    from sgpt_tpu.parallel import make_mesh

    n_dev = jax.device_count()
    mesh = make_mesh(dp=args.dp) if n_dev > 1 else None
    mesh_devices = int(np.prod(mesh.devices.shape)) if mesh is not None else 1

    # Build the corpus directly on device, SHARDED at creation: materializing
    # (ndocs, dim) on one chip first would cap the benchmark at single-chip HBM.
    granularity = 128 * (mesh.shape["dp"] if mesh is not None else 1)
    ndocs = ((args.ndocs + granularity - 1) // granularity) * granularity
    gen_kw = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        gen_kw["out_shardings"] = NamedSharding(mesh, P("dp", None))
    gen = jax.jit(
        lambda key: jax.random.normal(key, (ndocs, args.dim), jnp.bfloat16),
        **gen_kw)
    corpus = gen(jax.random.key(0))
    index = DenseIndex.from_device_embeddings(corpus, mesh=mesh)

    qkey = jax.random.key(1)
    lat = []
    # warm/compile
    q = jax.random.normal(qkey, (args.qbatch, args.dim), jnp.bfloat16)
    np.asarray(index._search_fn(q, args.k)[0])
    for i in range(args.iters):
        q = jax.random.normal(jax.random.fold_in(qkey, i),
                              (args.qbatch, args.dim), jnp.bfloat16)
        q.block_until_ready()
        t0 = time.perf_counter()
        vals, idx = index._search_fn(q, args.k)
        np.asarray(vals)  # host fetch = true completion
        lat.append(time.perf_counter() - t0)

    import math
    lat_ms = sorted(x * 1e3 for x in lat)
    # nearest-rank percentile: p95 of 20 samples is sample 19, not the max
    p95 = lat_ms[min(len(lat_ms) - 1, max(0, math.ceil(0.95 * len(lat_ms)) - 1))]
    print(json.dumps({
        "ndocs": ndocs, "dim": args.dim, "k": args.k,
        "qbatch": args.qbatch, "devices": mesh_devices,
        "p50_ms": round(lat_ms[len(lat_ms) // 2], 2),
        "p95_ms": round(p95, 2),
        "queries_per_sec": round(args.qbatch / (sum(lat) / len(lat)), 1),
    }))


if __name__ == "__main__":
    main()
