"""Fused-vs-XLA attention A/B at GPT-J's PER-SHARD width under TP.

One real chip is available, so a literal tp=2 run cannot be timed here.
What TP changes for the kernel is only the per-device attention geometry:
each shard computes H/tp = 8 heads of Dh=256 (HD=2048) independently —
exactly the workload this harness times on one chip, fused vs XLA, at the
BEIR length (T=304). The full-width case (H=16, HD=4096) is also timed with
the XLA path only, since it fails the fused kernel's VMEM gate — that gate
opening at HD/tp is the point of the TP integration
(models/decoder.py fused gate; tests/test_parallel.py VMEM-gate test).

    python tools/bench_fused_tp_width.py [--layers 8] [--batch 32]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run(cfg, params, ids, mask, iters=8):
    import jax
    import _guard  # noqa: E402  (tools/ is sys.path[0] when run as a script)
    _guard.require_tpu(jax)
    import jax.numpy as jnp
    from sgpt_tpu.models.decoder import forward

    @jax.jit
    def many(params, ids0, mask):
        def step(acc, i):
            h = forward(params, (ids0 + i) % cfg.vocab_size, mask, cfg)
            return acc + jnp.sum(h.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, jnp.float32(0),
                              jnp.arange(iters, dtype=jnp.int32))
        return acc

    float(many(params, ids, mask))  # compile+warm
    best = 1e9
    for r in range(3):
        t0 = time.perf_counter()
        float(many(params, ids + r + 1, mask))  # host fetch = sync; vary ids
        best = min(best, time.perf_counter() - t0)
    return iters * ids.shape[0] / best  # seq/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=304)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from sgpt_tpu.models import DecoderConfig, init_params, cast_params
    from sgpt_tpu.ops.pallas.short_attention import fwd_fits_vmem

    rng = np.random.default_rng(0)

    def geometry(H, Dh, name):
        cfg = DecoderConfig(
            vocab_size=1024, hidden_size=H * Dh, num_layers=args.layers,
            num_heads=H, head_dim=Dh, position_embedding="rotary",
            rotary_dim=64, parallel_residual=True, out_bias=False,
            scale_attn=True, dtype=jnp.bfloat16, matmul_precision="default",
            max_position_embeddings=2048)
        params = cast_params(init_params(cfg, jax.random.key(0)), jnp.bfloat16)
        ids = jnp.asarray(rng.integers(0, 1024, (args.batch, args.seq)),
                          jnp.int32)
        mask = np.ones((args.batch, args.seq), np.int32)
        for i in range(args.batch):
            mask[i, args.seq - rng.integers(0, args.seq // 10):] = 0
        mask = jnp.asarray(mask)
        fits = fwd_fits_vmem(args.seq, H * Dh, 2)
        print(f"{name}: HD={H * Dh}, fused VMEM gate: "
              f"{'fits' if fits else 'OVERFLOWS'}")
        r_xla = run(cfg.replace(fused_attention=False), params, ids, mask)
        print(f"  XLA attention:   {r_xla:8.1f} seq/s")
        if fits:
            r_fused = run(cfg.replace(fused_attention=True), params, ids, mask)
            print(f"  fused kernel:    {r_fused:8.1f} seq/s  "
                  f"({r_fused / r_xla:.2f}x)")

    # GPT-J per-shard slice at tp=2: the geometry each device runs
    geometry(8, 256, "GPT-J tp=2 shard (8 heads x 256)")
    # full GPT-J width: fused must be gated off (XLA only)
    geometry(16, 256, "GPT-J full width (16 heads x 256)")


if __name__ == "__main__":
    main()
