"""Long-context embedding demo: beyond the reference's 2048-token ceiling.

The reference handles long documents by truncating them (SURVEY.md §5 — max
position embeddings 2048, BEIR/specb clamps to 300). This framework scales the
sequence axis instead:

  * single chip, T >= 1024: the Pallas flash kernel — O(T) memory, no (T, T)
    score materialization (cfg.use_flash=True; engages when T % 128 == 0),
  * multi-chip, T beyond one chip: ring attention — the sequence axis shards
    over the mesh and key/value blocks rotate over ICI
    (EmbeddingEngine(sp_mesh=...)).

Run on 8 virtual CPU devices:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/long_context_encode.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS") is None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.models import tiny, init_params
    from sgpt_tpu.parallel import make_mesh
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("neo", num_layers=2, hidden_size=64, num_heads=4,
               max_position_embeddings=8192)
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)

    # a ~6000-word document — far beyond the reference's 2048-token ceiling
    doc = " ".join(f"section {i} discusses topic number {i % 17} in detail"
                   for i in range(750))
    print(f"document: ~{len(doc.split())} words")

    # 1) plain XLA attention (materializes (T, T) scores) — the reference path
    plain = EmbeddingEngine(params, cfg, tok, batch_size=1, max_seq_len=8192)
    e_plain = plain.encode([doc])

    # 2) ring attention over an 8-device mesh: T shards to 1024 per device
    mesh = make_mesh(dp=-1, tp=1)
    ring = EmbeddingEngine(params, cfg, tok, batch_size=1, max_seq_len=8192,
                           sp_mesh=mesh)
    e_ring = ring.encode([doc])

    diff = float(np.abs(e_plain - e_ring).max())
    print(f"ring-attention embedding == XLA embedding: max|diff| = {diff:.2e}")
    assert diff < 2e-3
    print("ok")


if __name__ == "__main__":
    main()
