"""Ours vs the REFERENCE'S OWN ENCODE PATTERN on the identical TPU tile.

BASELINE.json's >=5x emb/s/chip north star was, through round 2, backed only
by a computed A100 reference point (bench.py's 2000 emb/s at an assumed 50%
A100 utilization). This harness measures the implementation multiple on the
same silicon: the SAME model, tile, and token batches, processed two ways:

  ours:      fused forward + position-weighted pooling + normalize on
             device; one (B, D) fetch per batch (~1.5 MB — negligible).
  reference: the semantics of beir_dense_retriever.py:225-306 — forward
             with output_hidden_states=True, the FULL (L+1, B, T, D) hidden
             stack leaves the device EVERY batch (line 221:
             `[x.cpu() for x in all_hidden_states]`), position-weighted
             pooling in numpy on host.

Methodology notes (all in the direction of GENEROSITY to the reference):
  * Both patterns run on the identical pre-padded batches, so the token-
    budget-bucketing advantage measured elsewhere (docs/PERF.md, 1.6-4.7x
    on ragged corpora) is NOT counted here.
  * Device work is timed with R-rep chained jits synced by a host fetch —
    the dev relay's ~30 ms dispatch RPC amortizes out of both patterns.
  * The stack D2H is NOT charged at this relay's measured rate (~8 MB/s,
    two orders slower than any local link). It is charged at 25 GB/s — an
    A100-class PCIe gen4 effective rate — using the measured byte volume.
    The relay-measured time is also printed for the record.
  * Host pooling is numpy on this host's single core; the reference's torch
    would multi-thread it, so its measured time is ALSO reported divided by
    8 as a strong-host bound.

Per-scale mode (VERDICT r3 #3 — the multiple where the advantages compound):
`--model 1.3b|2.7b|gptj|bloom7b1` runs the same A/B at production scales.
At gptj/bloom7b1 the reference pattern does not even RUN on one A100-40GB
(sgptce.py:54-60 shards layers over GPUs + disk offload; the hidden-state
stack leaves whichever device holds each layer) — here both patterns fit one
chip, and `--quantize int8` additionally reports the int8 ours row (weights
halved, ~1.5x matmul rate at D=4096; docs/PERF.md "GPT-J-6B" section).

    python tools/bench_reference_pattern.py [--docs 1024] [--batch 256]
        [--model 125m] [--quantize int8]
"""
import argparse
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

PCIE_GBPS = 25.0  # A100-class effective PCIe gen4 device->host rate


DEFAULT_BATCH = {"125m": 256, "1.3b": 64, "2.7b": 32, "gptj": 16,
                 "bloom7b1": 16}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=0,
                    help="0 = 4 batches at the model's default batch size")
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--maxseq", type=int, default=300)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--model", default="125m",
                    choices=sorted(DEFAULT_BATCH))
    ap.add_argument("--quantize", choices=["int8"], default=None,
                    help="additionally report the int8 ours row")
    ap.add_argument("--engine", action="store_true",
                    help="additionally time OUR REAL ENGINE PATH "
                    "(EmbeddingEngine: tokenize-once + token-budget "
                    "bucketing + fused pool) on the same ragged docs — the "
                    "end-to-end multiple as ONE measurement instead of "
                    "pattern-ratio x batching-ratio arithmetic")
    ap.add_argument("--engine-chain", type=int, default=8,
                    help="EmbeddingEngine dispatch_chain for --engine "
                    "(1 disables dispatch chaining — the A/B for the "
                    "planned lax.map bulk-dispatch grouping)")
    args = ap.parse_args()
    args.batch = args.batch or DEFAULT_BATCH[args.model]
    args.docs = args.docs or 4 * args.batch

    import jax

    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)

    _guard.require_tpu(jax)
    import jax.numpy as jnp

    from sgpt_tpu.models import gpt_neo, gpt_j_6b, bloom, init_params, \
        cast_params
    from sgpt_tpu.models.decoder import forward
    from sgpt_tpu.ops.pooling import weighted_mean_pool, normalize
    from sgpt_tpu.tokenization import SimpleTokenizer

    on_tpu = jax.default_backend() == "tpu"
    base = (gpt_j_6b() if args.model == "gptj"
            else bloom("7b1") if args.model == "bloom7b1"
            else gpt_neo(args.model))
    cfg = base.replace(dtype=jnp.bfloat16, matmul_precision="default",
                       fused_attention=on_tpu)
    params = cast_params(init_params(cfg, jax.random.key(0)), jnp.bfloat16)
    jax.block_until_ready(params)
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)

    # BEIR-like ragged lengths, length-sorted fixed-row batches padded to the
    # batch longest (exactly the reference's batching for BOTH patterns)
    rng = np.random.default_rng(0)
    lens = np.clip(rng.lognormal(4.3, 0.8, args.docs).astype(int), 10, 280)
    texts = [" ".join(f"w{rng.integers(50000)}" for _ in range(n))
             for n in lens]
    rows = [tok.encode(t)[: args.maxseq] for t in texts]
    order = sorted(range(len(rows)), key=lambda i: -len(rows[i]))
    batches = []
    for s in range(0, len(order), args.batch):
        sel = order[s : s + args.batch]
        T = max(len(rows[i]) for i in sel)
        ids = np.zeros((len(sel), T), np.int32)
        mask = np.zeros((len(sel), T), np.int32)
        for bi, i in enumerate(sel):
            ids[bi, : len(rows[i])] = rows[i]
            mask[bi, : len(rows[i])] = 1
        batches.append((jnp.asarray(ids), jnp.asarray(mask)))

    R = args.reps

    @partial(jax.jit, static_argnames=("with_stack",))
    def many(params, ids0, mask, with_stack):
        def step(acc, i):
            ids = (ids0 + i) % cfg.vocab_size
            if with_stack:
                h = forward(params, ids, mask, cfg, output_hidden_states=True)
                # consume EVERY layer: the reference fetches the whole stack,
                # and summing only h[-1] would let XLA dead-code the rest
                return acc + jnp.sum(h.astype(jnp.float32)), None
            h = forward(params, ids, mask, cfg)
            emb = normalize(weighted_mean_pool(h, mask))
            return acc + jnp.sum(emb.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(R, dtype=jnp.int32))
        return acc

    def timed(with_stack):
        total = 0.0
        for ids, mask in batches:
            float(many(params, ids, mask, with_stack))  # compile+warm
            best = 1e9
            for r in range(2):
                t0 = time.perf_counter()
                float(many(params, ids + r + 1, mask, with_stack))
                best = min(best, time.perf_counter() - t0)
            total += best / R
        return total

    t_ours_dev = timed(with_stack=False)
    t_ref_dev = timed(with_stack=True)

    # D2H byte volume of the reference pattern (full stack + mask per batch)
    bytes_d2h = sum((cfg.num_layers + 1) * i.shape[0] * i.shape[1]
                    * cfg.hidden_size * 2 for i, _ in batches)
    # measure ONE layer's fetch for the relay-rate record (a full 6B stack is
    # multiple GB — at this relay's ~10 MB/s that fetch alone would take
    # minutes, and the rate is what's being recorded, not the volume)
    ids, mask = batches[0]
    stack = forward(params, ids, mask, cfg, output_hidden_states=True)
    jax.block_until_ready(stack)  # don't fold pending compute into the rate
    t0 = time.perf_counter()
    last_h = np.asarray(stack[-1])
    t_one = time.perf_counter() - t0
    b_one = last_h.nbytes
    del stack
    t_d2h_pcie = bytes_d2h / (PCIE_GBPS * 1e9)

    # host pooling on the fetched last layer (numpy, single core) — the
    # reference pools exactly one layer of the stack it fetched. Best-of-3:
    # a single rep on a shared host can be inflated several-fold by
    # unrelated load, which would flatter OUR ratio. Pooling cost is linear
    # in the batch's B*T elements, so scale the measured batch-0 time by
    # each batch's element count instead of multiplying the LONGEST batch
    # (batches are length-sorted descending) by len(batches) — that
    # overstated the reference's cost against this file's stated generosity.
    mask_h = np.asarray(mask, np.float32)
    elems0 = ids.shape[0] * ids.shape[1]
    elems_total = sum(i.shape[0] * i.shape[1] for i, _ in batches)
    t_pool1 = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        h = last_h.astype(np.float32)
        w = np.arange(1, h.shape[1] + 1, dtype=np.float32)[None, :, None]
        me = mask_h[:, :, None]
        emb = (h * me * w).sum(1) / (me * w).sum(1)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        t_pool1 = min(t_pool1, time.perf_counter() - t0)
    t_pool = t_pool1 * elems_total / elems0

    t_ref_pcie = t_ref_dev + t_d2h_pcie + t_pool
    t_ref_pcie_strong = t_ref_dev + t_d2h_pcie + t_pool / 8  # multicore host

    # optional: OUR REAL ENGINE on the same ragged docs (tokenize-once +
    # token-budget buckets + fused pool + fetch pipeline) — end-to-end, so
    # the batching advantage is measured, not multiplied in. Warm pass
    # compiles every bucket; timed pass uses fresh words with the identical
    # length multiset (same buckets, anti-memoization).
    t_engine = None
    if args.engine:
        from sgpt_tpu.encoder import EmbeddingEngine
        engine = EmbeddingEngine(params, cfg, tok, method="weightedmean",
                                 max_seq_len=args.maxseq,
                                 batch_size=args.batch,
                                 normalize_embeddings=True,
                                 dispatch_chain=args.engine_chain)
        texts2 = [" ".join(f"v{rng.integers(50000)}" for _ in range(n))
                  for n in lens]
        engine.encode(texts)                       # warm + compile buckets
        t0 = time.perf_counter()
        out_e = engine.encode(texts2)
        t_engine = time.perf_counter() - t0
        assert np.isfinite(out_e).all()

    # optional: the int8 serving row for ours (quantize the SAME tree in
    # place, bf16 kernels freed as int8 copies land — the one-chip recipe)
    t_ours_int8 = None
    if args.quantize == "int8":
        from sgpt_tpu.ops.quant import quantize_decoder_params

        params = quantize_decoder_params(params, free_source=True)
        jax.block_until_ready(params)
        t_ours_int8 = timed(with_stack=False)

    print(f"device work   ours: {t_ours_dev:6.3f}s   "
          f"ref-pattern: {t_ref_dev:6.3f}s   (docs={args.docs}, "
          f"model={args.model})")
    print(f"ref D2H: {bytes_d2h / 1e9:.2f} GB  -> {t_d2h_pcie:.3f}s @ "
          f"{PCIE_GBPS:.0f} GB/s PCIe  (this relay measured "
          f"{b_one / t_one / 1e6:.0f} MB/s - not charged)")
    print(f"ref host pooling: {t_pool:.3f}s 1-core ({t_pool / 8:.3f}s /8)")
    print(json.dumps({
        "model": args.model,
        "ours_emb_s": round(args.docs / t_ours_dev, 1),
        **({"engine_emb_s": round(args.docs / t_engine, 1),
            "ratio_e2e_vs_pcie_strong_host":
                round(t_ref_pcie_strong / t_engine, 2),
            "ratio_e2e_vs_pcie_1core": round(t_ref_pcie / t_engine, 2)}
           if t_engine else {}),
        **({"ours_int8_emb_s": round(args.docs / t_ours_int8, 1),
            "ratio_int8_vs_pcie_strong_host":
                round(t_ref_pcie_strong / t_ours_int8, 2)}
           if t_ours_int8 else {}),
        "ref_pattern_emb_s_pcie": round(args.docs / t_ref_pcie, 1),
        "ref_pattern_emb_s_pcie_strong_host": round(
            args.docs / t_ref_pcie_strong, 1),
        "ref_pattern_device_only_emb_s": round(args.docs / t_ref_dev, 1),
        "ratio_vs_pcie": round(t_ref_pcie / t_ours_dev, 2),
        "ratio_vs_pcie_strong_host": round(t_ref_pcie_strong / t_ours_dev, 2),
        "ratio_device_only": round(t_ref_dev / t_ours_dev, 2),
        "d2h_gb": round(bytes_d2h / 1e9, 2),
    }))


if __name__ == "__main__":
    main()
