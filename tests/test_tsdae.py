"""TSDAE (DenoisingAutoEncoderLoss) — tied encoder-decoder reconstruction.

Parity target: sentence_transformers/losses/DenoisingAutoEncoderLoss.py.
Done-criterion (VERDICT r1 item 6): loss decreases on a tiny corpus.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.data import DenoisingBatcher, denoise_text
from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.models.decoder import forward
from sgpt_tpu.tokenization import SimpleTokenizer
from sgpt_tpu.training import TSDAETrainer, init_tsdae_params, tsdae_loss


CFG = tiny("neo", num_layers=2, hidden_size=32, num_heads=2, vocab_size=256)


def test_zero_cond_projection_matches_unconditioned_forward():
    """With w=b=0 the conditioning is a no-op — the decoder forward must be
    bitwise identical to the plain forward (the degenerate-cross-attention
    wiring adds nothing when the projection is zero)."""
    params = init_params(CFG, jax.random.key(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 12)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    zero = jax.tree.map(jnp.zeros_like, init_tsdae_params(CFG, jax.random.key(1)))
    rep = jnp.ones((2, CFG.hidden_size), jnp.float32)
    base = forward(params, ids, mask, CFG)
    cond = forward(params, ids, mask, CFG, cond=rep, cond_params=zero)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(cond))


def test_cond_changes_output():
    params = init_params(CFG, jax.random.key(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 12)),
                      jnp.int32)
    mask = jnp.ones_like(ids)
    cp = init_tsdae_params(CFG, jax.random.key(1))
    r1 = forward(params, ids, mask, CFG,
                 cond=jnp.ones((2, 32), jnp.float32), cond_params=cp)
    r2 = forward(params, ids, mask, CFG,
                 cond=2.0 * jnp.ones((2, 32), jnp.float32), cond_params=cp)
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def test_tsdae_loss_decreases_on_tiny_corpus():
    tok = SimpleTokenizer(vocab_size=256)
    params = init_params(CFG, jax.random.key(0))
    sentences = [f"the quick brown animal number {i} jumps over fence {i}"
                 for i in range(8)]
    trainer = TSDAETrainer(params, CFG, tok, max_seq_len=16, lr=3e-3)
    batcher = DenoisingBatcher(sentences, batch_size=4, seed=0)
    history = trainer.fit(batcher, epochs=10)
    first = np.mean([h["loss"] for h in history[:2]])
    last = np.mean([h["loss"] for h in history[-2:]])
    assert last < first, f"TSDAE loss did not decrease: {first} -> {last}"
    assert all(np.isfinite(h["loss"]) for h in history)


def test_tsdae_gradients_flow_to_both_paths():
    """Tied weights: the encoder params must receive gradient through BOTH the
    encoding and the decoding path; the conditioning projections must too."""
    from sgpt_tpu.tokenization.specb import SpecbCodec
    tok = SimpleTokenizer(vocab_size=256)
    params = init_params(CFG, jax.random.key(0))
    cp = init_tsdae_params(CFG, jax.random.key(1))
    enc = SpecbCodec(tok, max_seq_len=12, specb=False).encode(
        ["alpha beta gamma", "delta epsilon zeta"], pad_to=12)
    ids = jnp.asarray(enc.input_ids)
    mask = jnp.asarray(enc.attention_mask)

    def loss(p, c):
        return tsdae_loss(p, c, ids, mask, ids, mask, CFG)

    gp, gc = jax.grad(loss, argnums=(0, 1))(params, cp)
    assert float(jnp.linalg.norm(gp["layers"]["attn"]["wq"])) > 0
    assert float(jnp.linalg.norm(gc["w"])) > 0


def test_denoising_batcher_pairs():
    sents = [f"sentence with several words number {i}" for i in range(6)]
    b = DenoisingBatcher(sents, batch_size=3, seed=1)
    batches = list(b)
    assert len(batches) == 2
    for batch in batches:
        for ex in batch:
            noisy, orig = ex.texts
            assert orig in sents
            # every kept noisy word comes from the original
            assert all(w in orig.split() for w in noisy.split())
    # noise resamples across epochs
    again = list(b)
    assert any(a[0].texts[0] != b2[0].texts[0] for a, b2 in zip(batches, again)) \
        or batches[0][0].texts[1] != again[0][0].texts[1]


def test_train_tsdae_cli(tmp_path, monkeypatch):
    import sys

    from sgpt_tpu.cli import train_tsdae

    def fake_build(model_name, random_init=False, dtype_str="float32"):
        return (init_params(CFG, jax.random.key(0)), CFG,
                SimpleTokenizer(vocab_size=256))

    monkeypatch.setattr(train_tsdae, "build_model", fake_build)
    path = tmp_path / "sents.txt"
    path.write_text("\n".join(f"many different words in line {i}"
                              for i in range(8)))
    sys.argv = ["x", "--model_name", "tiny", "--randominit",
                "--sentences_path", str(path), "--train_batch_size", "4",
                "--max_seq_length", "16", "--num_epochs", "1", "--lr", "1e-3",
                "--model_save_path", str(tmp_path / "out")]
    train_tsdae.main()
    assert (tmp_path / "out").exists()
