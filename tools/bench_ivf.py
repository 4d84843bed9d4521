"""IVF vs exact-scan serving latency + recall at corpus scale.

    python tools/bench_ivf.py --ndocs 10000000 --nprobe 8,32,64

Corpus: gaussian mixture with noise scaled by 1/sqrt(dim) so the cluster
signal survives at embedding dims (clusterable — IVF's operating regime and
how real embedding corpora behave; uniform-random vectors are the degenerate
no-structure case where ANN cannot beat a scan). `--spread 0.75` means the
noise component has ~0.75 the norm of the unit center, i.e. cosine ~0.8 to
the center — a realistic topic-cluster tightness.

Recall oracle: fp32 exact scores, updated streamingly per generation chunk
(the fp32 chunk is transient; both indexes store int8).

Two latency views per config:
  * wall p50 per search_embeddings call — includes the dev relay's ~30-50 ms
    per-dispatch RPC (production serving pays microseconds, docs/PERF.md);
  * device-only — R searches chained inside ONE jit (probe matmul + overflow
    exact scan, host-fetch synced), the same amortization technique as
    bench.py / bench_index_10m.py.
"""
import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def time_search(index, q, k, iters=10, **kw):
    lat = []
    for i in range(iters + 1):
        qq = q + np.float32(i * 1e-6)          # anti-memoization
        t0 = time.perf_counter()
        index.search_embeddings(qq, k=k, **kw)
        dt = time.perf_counter() - t0
        if i:                                   # drop the warmup dispatch
            lat.append(dt)
    return round(float(np.median(lat) * 1000), 2)


R_LO = int(os.environ.get("BENCH_IVF_RLO", 64))    # overridable for CPU
R_HI = int(os.environ.get("BENCH_IVF_RHI", 320))   # smoke tests of the tool


def _slope_ms(make_chained, reps=3):
    """Per-search device ms via two chain lengths: the slope between R=64 and
    R=320 cancels EVERY fixed cost (the dev relay's ~30-50 ms dispatch RPC,
    host sync, scan setup) — dividing one chain by its R does not: an empty
    R=32 chain still 'measures' 0.95 ms/search of pure relay."""
    t = {}
    for R in (R_LO, R_HI):
        f, args = make_chained(R)
        float(f(*args))   # compile + warm
        t[R] = min(_timed(f, *args) for _ in range(reps))
    return round((t[R_HI] - t[R_LO]) / (R_HI - R_LO) * 1e3, 3)


def device_only_ms(ivf, q, k, nprobe):
    """Slope-measured per-search device ms (probe + overflow exact scan)."""
    import jax
    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)
    _guard.require_tpu(jax)
    import jax.numpy as jnp
    from sgpt_tpu.index_ivf import _probe_search
    from sgpt_tpu.ops.topk import blockmax_topk

    quantized = ivf.quantize == "int8"
    has_ov = ivf._overflow_count > 0
    kc = min(k, nprobe * int(ivf._blocks.shape[1]))
    qd = jnp.asarray(q, jnp.float32)
    args = (ivf._centroids, ivf._blocks, ivf._block_ids, ivf._scales,
            ivf._overflow, ivf._overflow_scales)

    def make(R):
        @jax.jit
        def chained(q0, cent, blocks, bids, scales, ov, ovs):
            def step(acc, i):
                qi = jnp.roll(q0, i, axis=1)
                tv, _ = _probe_search(qi, cent, blocks, bids, scales, kc,
                                      nprobe, quantized)
                acc = acc + jnp.sum(tv)
                if has_ov:
                    ov_v, _ = blockmax_topk(qi, ov, ivf._overflow_count, k=k,
                                            block_size=ivf.block_size,
                                            corpus_scale=ovs)
                    acc = acc + jnp.sum(ov_v)
                return acc, None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(R, dtype=jnp.int32))
            return acc
        return chained, (qd, *args)
    return _slope_ms(make)


def device_only_exact_ms(idx, q, k):
    import jax
    import jax.numpy as jnp
    from sgpt_tpu.ops.topk import blockmax_topk

    qd = jnp.asarray(q, idx.dtype)

    def make(R):
        @jax.jit
        def chained(q0, corpus, scales):
            def step(acc, i):
                v, _ = blockmax_topk(jnp.roll(q0, i, axis=1), corpus,
                                     idx._built_count, k=k,
                                     block_size=idx.block_size,
                                     slab_size=idx._slab_eff,
                                     corpus_scale=scales)
                return acc + jnp.sum(v), None
            acc, _ = jax.lax.scan(step, jnp.float32(0),
                                  jnp.arange(R, dtype=jnp.int32))
            return acc
        return chained, (qd, idx._corpus, idx._scales)
    return _slope_ms(make)


def _timed(f, *a):
    t0 = time.perf_counter()
    float(f(*a))   # host fetch = true sync on the relay
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndocs", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--centers", type=int, default=4096,
                    help="true mixture components in the synthetic corpus")
    ap.add_argument("--spread", type=float, default=0.75,
                    help="noise-to-signal norm ratio within a cluster")
    ap.add_argument("--clusters", default="auto",
                    type=lambda s: s if s in ("auto", "n600") else int(s),
                    help="IVF cluster count; 'auto' (default) = the index's "
                    "sample-sweep overflow-knee selection; 'n600' = the old "
                    "~ndocs/600 heuristic (kept for the A/B in docs/PERF.md)")
    ap.add_argument("--nprobe", default="8,32,64")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nq", type=int, default=16)
    ap.add_argument("--chunk", type=int, default=500_000)
    ap.add_argument("--pad-factor", type=float, default=1.5)
    ap.add_argument("--skip-exact", action="store_true",
                    help="skip the exact-scan baseline (faster reruns)")
    ap.add_argument("--corpus-cache", default=None,
                    help="npz path: persist the generated int8 corpus + "
                    "oracle on first run, reuse on reruns (the 10M gen "
                    "costs ~40 min of single-core numpy)")
    ap.add_argument("--gen-only", action="store_true",
                    help="generate + save --corpus-cache and exit without "
                    "touching the device (pre-generate while the TPU is busy)")
    args = ap.parse_args()
    if args.gen_only and not args.corpus_cache:
        ap.error("--gen-only requires --corpus-cache")
    if args.clusters == "n600":
        K = max(64, 1 << int(np.log2(args.ndocs / 600) + 0.5))
    else:
        K = args.clusters  # "auto" or an explicit int

    from sgpt_tpu.index import DenseIndex
    from sgpt_tpu.index_ivf import IVFIndex

    rng = np.random.default_rng(0)
    mu = rng.standard_normal((args.centers, args.dim), dtype=np.float32)
    mu /= np.linalg.norm(mu, axis=1, keepdims=True)
    noise = args.spread / np.sqrt(args.dim)

    exact = (None if args.skip_exact
             else DenseIndex(args.dim, normalize_embeddings=True,
                             quantize="int8"))
    # k-means sample: >=32 docs per centroid (bounded 1M) — the default 256k
    # cap is too thin at K=16384 (16/cluster). auto-K candidates cap at
    # train_rows//64, so 1M rows unlocks K up to 16384 in the sweep.
    train_rows = (1 << 20 if K == "auto"
                  else min(1 << 20, max(1 << 18, 32 * K)))
    ivf = IVFIndex(args.dim, n_clusters=K, quantize="int8",
                   pad_factor=args.pad_factor, max_train_rows=train_rows)
    cache = args.corpus_cache
    if cache and os.path.exists(cache):
        z = np.load(cache)
        assert z["rows"].shape == (args.ndocs, args.dim), \
            "corpus cache was generated with different --ndocs/--dim"
        assert z["oracle"].shape == (args.nq, args.k), \
            "corpus cache oracle was generated with different --nq/--k"
        q, best_idx = z["q"], z["oracle"]
        # NOT filter(None, ...): an empty index is len()==0 and thus falsy
        for idx_obj in (o for o in (exact, ivf) if o is not None):
            # inject the pre-quantized rows directly (add() expects floats)
            idx_obj._chunks = [z["rows"]]
            idx_obj._scale_chunks = [z["scales"]]
            idx_obj._ids = [str(i) for i in range(args.ndocs)]
            idx_obj._count = args.ndocs
        print(f"  corpus cache hit: {cache}", file=sys.stderr)
        oracle = [set(row) for row in best_idx]
        return _run_indexes(args, K, exact, ivf, q, oracle)
    q = None
    best_vals = np.full((args.nq, args.k), -np.inf, np.float32)
    best_idx = np.zeros((args.nq, args.k), np.int64)
    t0 = time.perf_counter()
    for s in range(0, args.ndocs, args.chunk):
        n = min(args.chunk, args.ndocs - s)
        a = rng.integers(0, args.centers, n)
        chunk = mu[a] + noise * rng.standard_normal((n, args.dim),
                                                    dtype=np.float32)
        chunk /= np.linalg.norm(chunk, axis=1, keepdims=True)
        if q is None:   # queries: perturbed docs from the first chunk
            picks = rng.integers(0, n, args.nq)
            q = chunk[picks] + 0.02 * rng.standard_normal(
                (args.nq, args.dim), dtype=np.float32)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        # streaming fp32 oracle on the transient chunk
        sc = qn @ chunk.T
        cat_v = np.concatenate([best_vals, sc.astype(np.float32)], axis=1)
        cat_i = np.concatenate(
            [best_idx, np.broadcast_to(np.arange(s, s + n),
                                       (args.nq, n))], axis=1)
        ord_ = np.argsort(-cat_v, axis=1)[:, :args.k]
        best_vals = np.take_along_axis(cat_v, ord_, axis=1)
        best_idx = np.take_along_axis(cat_i, ord_, axis=1)
        if exact is not None:
            exact.add(chunk)
        ivf.add(chunk)
        print(f"  gen+add {s + n}/{args.ndocs} "
              f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)
    oracle = [set(row) for row in best_idx]
    if cache:
        src = ivf if exact is None else exact
        np.savez(cache, rows=np.concatenate(src._chunks),
                 scales=np.concatenate(src._scale_chunks),
                 q=q, oracle=best_idx)
        print(f"  corpus cache saved: {cache}", file=sys.stderr)
    if args.gen_only:
        print(json.dumps({"gen_only": True, "ndocs": args.ndocs,
                          "cache": cache}))
        return None
    return _run_indexes(args, K, exact, ivf, q, oracle)


def _run_indexes(args, K, exact, ivf, q, oracle):
    # guard the WHOLE measured path, not just the slope chains: a silent CPU
    # fallback would otherwise burn hours of build/wall measurements printing
    # ~100x-slow garbage rows before device_only_ms() finally checked
    import jax
    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)
    _guard.require_tpu(jax)

    def recall(ids_lists):
        hit = sum(len({int(i) for i in r} & o)
                  for r, o in zip(ids_lists, oracle))
        return round(hit / (args.nq * args.k), 4)

    out = {"ndocs": args.ndocs, "dim": args.dim, "k": args.k, "clusters": K,
           "centers": args.centers, "spread": args.spread,
           "quantize": "int8", "rows": []}

    if exact is not None:
        t0 = time.perf_counter()
        exact.build()
        out["exact_build_s"] = round(time.perf_counter() - t0, 1)
        _, ids = exact.search_embeddings(q, k=args.k)
        row = {"index": "exact-int8", "recall_at_k": recall(ids),
               "wall_p50_ms_q1": time_search(exact, q[:1], args.k),
               "dev_ms_q1": device_only_exact_ms(exact, q[:1], args.k)}
        out["rows"].append(row)
        print(json.dumps(row), file=sys.stderr)
        del exact   # free ~N*D bytes of HBM before the IVF blocks land

    t0 = time.perf_counter()
    ivf.build()
    out["ivf_build_s"] = round(time.perf_counter() - t0, 1)
    out["clusters"] = int(ivf.selected_k)  # the realized K under "auto"
    out["overflow_docs"] = int(ivf._overflow_count)
    out["c_pad"] = int(ivf._blocks.shape[1])

    for nprobe in (int(x) for x in args.nprobe.split(",")):
        _, ids = ivf.search_embeddings(q, k=args.k, nprobe=nprobe)
        row = {"index": "ivf-int8", "nprobe": nprobe,
               "recall_at_k": recall(ids),
               "wall_p50_ms_q1": time_search(ivf, q[:1], args.k,
                                             nprobe=nprobe),
               "dev_ms_q1": device_only_ms(ivf, q[:1], args.k, nprobe)}
        out["rows"].append(row)
        print(json.dumps(row), file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
