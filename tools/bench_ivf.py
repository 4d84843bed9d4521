"""IVF vs exact-scan serving latency + recall at corpus scale.

    python tools/bench_ivf.py --ndocs 1000000 --nprobe 8,32

Corpus: gaussian mixture (clusterable — IVF's operating regime and how real
embedding corpora behave; uniform-random vectors are the degenerate no-
structure case where ANN cannot beat a scan). Recall oracle: fp32 exact scan.
Latencies are per query BATCH on device (block_until_ready; first-dispatch
relay warmup discarded).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def mixture(n, dim, centers, seed=0, spread=0.35, chunk=250_000):
    rng = np.random.default_rng(seed)
    mu = rng.standard_normal((centers, dim), dtype=np.float32)
    mu /= np.linalg.norm(mu, axis=1, keepdims=True)
    out = np.empty((n, dim), np.float32)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        a = rng.integers(0, centers, e - s)
        out[s:e] = mu[a] + spread * rng.standard_normal((e - s, dim),
                                                        dtype=np.float32)
    return out


def time_search(index, q, k, iters=10, **kw):
    lat = []
    for i in range(iters + 1):
        qq = q + np.float32(i * 1e-6)          # anti-memoization
        t0 = time.perf_counter()
        index.search_embeddings(qq, k=k, **kw)
        dt = time.perf_counter() - t0
        if i:                                   # drop the warmup dispatch
            lat.append(dt)
    return float(np.median(lat) * 1000)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndocs", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--centers", type=int, default=4096)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--nprobe", default="8,32")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nq", type=int, default=64)
    ap.add_argument("--quantize", choices=["int8"], default="int8",
                    help="IVF block storage (int8 default: serving config)")
    args = ap.parse_args()

    from sgpt_tpu.index import DenseIndex
    from sgpt_tpu.index_ivf import IVFIndex

    print(f"generating {args.ndocs}x{args.dim} mixture ...", file=sys.stderr)
    emb = mixture(args.ndocs, args.dim, args.centers)
    rng = np.random.default_rng(1)
    q = emb[rng.integers(0, args.ndocs, args.nq)] \
        + 0.05 * rng.standard_normal((args.nq, args.dim), dtype=np.float32)

    # fp32 exact oracle (host, chunked — slow but indisputable)
    en = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    oracle = []
    for s in range(0, args.nq, 8):
        scores = qn[s:s + 8] @ en.T
        oracle.extend(set(np.argsort(-row)[:args.k]) for row in scores)
    del en

    out = {"ndocs": args.ndocs, "dim": args.dim, "k": args.k,
           "clusters": args.clusters, "quantize": args.quantize, "rows": []}

    exact = DenseIndex(args.dim, normalize_embeddings=True, quantize="int8")
    exact.add(emb)
    exact.build()
    for qb in (1, 8):
        out["rows"].append({
            "index": "exact-int8", "qbatch": qb,
            "p50_ms": time_search(exact, q[:qb], args.k)})
    _, ids = exact.search_embeddings(q, k=args.k)
    rec = sum(len({int(i) for i in r} & o) for r, o in zip(ids, oracle)) \
        / (args.nq * args.k)
    out["rows"][-1]["recall_at_k"] = round(rec, 4)
    del exact

    ivf = IVFIndex(args.dim, n_clusters=args.clusters,
                   quantize=args.quantize)
    t0 = time.perf_counter()
    ivf.add(emb)
    ivf.build()
    out["build_s"] = round(time.perf_counter() - t0, 1)
    out["overflow_docs"] = int(ivf._overflow_count)
    out["c_pad"] = int(ivf._blocks.shape[1])

    for nprobe in (int(x) for x in args.nprobe.split(",")):
        _, ids = ivf.search_embeddings(q, k=args.k, nprobe=nprobe)
        rec = sum(len({int(i) for i in r} & o) for r, o in zip(ids, oracle)) \
            / (args.nq * args.k)
        for qb in (1, 8):
            out["rows"].append({
                "index": f"ivf-{args.quantize or 'bf16'}", "nprobe": nprobe,
                "qbatch": qb,
                "p50_ms": time_search(ivf, q[:qb], args.k, nprobe=nprobe),
                "recall_at_k": round(rec, 4)})
        print(json.dumps(out["rows"][-1]), file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
