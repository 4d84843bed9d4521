"""A/B the depth-2 fetch pipeline in EmbeddingEngine.encode / score_pairs.

jit dispatch is async; the pipeline defers each batch's D2H fetch by one step
so batch i's device compute overlaps host tokenize/pack of batch i+1 plus the
relay's per-fetch RPC (~30 ms on this dev box). Depth 1 is the pre-pipelining
synchronous behavior. Alternating reps in ONE process (same sitting) cancel
tile drift; different text sets per rep defeat the relay's memoization.

    python tools/bench_fetch_pipeline.py [--n 8192] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_texts(rng, n, lo=8, hi=28):
    return [" ".join(f"w{rng.integers(0, 5000)}"
                     for _ in range(rng.integers(lo, hi))) for _ in range(n)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)
    _guard.require_tpu(jax)
    import jax.numpy as jnp

    import sgpt_tpu.crossencoder as ce_mod
    import sgpt_tpu.encoder as enc_mod
    from sgpt_tpu.crossencoder import CrossEncoderRanker
    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.models import cast_params, gpt_neo, init_params
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = gpt_neo("125m").replace(dtype=jnp.bfloat16, matmul_precision="default",
                                  fused_attention=jax.default_backend() == "tpu")
    params = cast_params(init_params(cfg, jax.random.key(0)), jnp.bfloat16)
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)

    # --- encode path: short texts = many small-bucket batches = many fetches
    eng = EmbeddingEngine(params, cfg, tok, method="weightedmean",
                          batch_size=32, max_seq_len=300)
    eng.encode(make_texts(np.random.default_rng(0), args.n))  # compile buckets
    seed = 1
    results: dict = {}
    for rep in range(args.reps):
        for depth in (1, 2):  # alternate so tile drift cancels
            enc_mod.FETCH_PIPELINE_DEPTH = depth
            texts = make_texts(np.random.default_rng(seed), args.n)
            seed += 1
            t0 = time.perf_counter()
            out = eng.encode(texts)
            dt = time.perf_counter() - t0
            assert np.isfinite(out).all()
            results.setdefault(("encode", depth), []).append(args.n / dt)
    enc_mod.FETCH_PIPELINE_DEPTH = 2

    # --- CE path: ragged pairs
    ranker = CrossEncoderRanker(params, cfg, tok, batch_size=16, max_length=512)
    rng = np.random.default_rng(100)
    n_pairs = max(128, args.n // 32)
    pairs = [(" ".join(f"q{rng.integers(0, 5000)}" for _ in range(8)),
              " ".join(f"d{rng.integers(0, 5000)}"
                       for _ in range(rng.integers(20, 400))))
             for _ in range(n_pairs)]
    ranker.predict(pairs[: n_pairs // 2])  # compile
    for rep in range(args.reps):
        for depth in (1, 2):
            ce_mod.FETCH_PIPELINE_DEPTH = depth
            sub = [(q, d + f" x{rep}{depth}") for q, d in pairs]
            t0 = time.perf_counter()
            scores = ranker.predict(sub)
            dt = time.perf_counter() - t0
            assert np.isfinite(scores).all()
            results.setdefault(("ce", depth), []).append(n_pairs / dt)
    ce_mod.FETCH_PIPELINE_DEPTH = 2

    for (path, depth), vals in sorted(results.items()):
        print(json.dumps({
            "metric": f"{path}_throughput", "pipeline_depth": depth,
            "value": round(max(vals), 1),
            "unit": "texts/s" if path == "encode" else "pairs/s",
            "reps": [round(v, 1) for v in vals]}), flush=True)


if __name__ == "__main__":
    main()
