"""End-to-end tiny contrastive training (the test_train_stsb.py analog,
SURVEY.md §4: training must improve the evaluator / reduce loss)."""
import numpy as np
import pytest

import jax

from sgpt_tpu.data import InputExample, NoDuplicatesBatcher
from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.training import ContrastiveTrainer, TrainConfig, load_checkpoint
from sgpt_tpu.tokenization import SimpleTokenizer

VOCAB = 512


def _toy_triplets(n=64, seed=0):
    """Paraphrase-style triplets: anchor and positive share words."""
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        a, b, c = rng.integers(0, 50, 3)
        anchor = f"topic{i % 8} word{a} word{b}"
        pos = f"topic{i % 8} word{a} word{c}"
        neg = f"topic{(i + 3) % 8} other{c} other{b}"
        out.append(InputExample(texts=(anchor, pos, neg)))
    return out


def _make_trainer(**overrides):
    cfg = tiny("neo", num_layers=2, hidden_size=32, num_heads=2, vocab_size=VOCAB)
    params = init_params(cfg, jax.random.key(0))
    defaults = dict(lr=1e-3, epochs=2, batch_size=8, max_seq_len=16)
    defaults.update(overrides)
    tc = TrainConfig(**defaults)
    return ContrastiveTrainer(params, cfg, SimpleTokenizer(vocab_size=VOCAB), tc)


def _fit(trainer, examples):
    batcher = NoDuplicatesBatcher(examples, trainer.tc.batch_size)

    def batches():
        for batch in batcher:
            yield [ex.texts for ex in batch]

    return trainer.fit(batches, steps_per_epoch=len(batcher))


def test_training_reduces_loss():
    trainer = _make_trainer()
    out = _fit(trainer, _toy_triplets())
    losses = [h["loss"] for h in out["history"] if "loss" in h]
    first_quarter = np.mean(losses[: len(losses) // 4])
    last_quarter = np.mean(losses[-len(losses) // 4:])
    assert last_quarter < first_quarter, (first_quarter, last_quarter)


def test_bitfit_only_biases_change():
    trainer = _make_trainer(freeze_nonbias=True, epochs=1)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.params)
    out = _fit(trainer, _toy_triplets(32))
    after = out["params"]
    assert np.array_equal(before["layers"]["attn"]["wq"],
                          np.asarray(after["layers"]["attn"]["wq"]))
    assert np.array_equal(before["wte"], np.asarray(after["wte"]))
    assert not np.array_equal(before["layers"]["mlp"]["bi"],
                              np.asarray(after["layers"]["mlp"]["bi"]))


def test_gradcache_training_runs_and_matches_direct_first_step():
    t_direct = _make_trainer(epochs=1, batch_size=8)
    t_gc = _make_trainer(epochs=1, batch_size=8, use_gradcache=True, chunk_size=4)
    ex = _toy_triplets(8)
    out_d = _fit(t_direct, ex)
    out_g = _fit(t_gc, ex)
    # identical data, params, optimizer ⇒ first-step loss identical
    assert abs(out_d["history"][0]["loss"] - out_g["history"][0]["loss"]) < 1e-4


def test_evaluator_and_best_model(tmp_path):
    trainer = _make_trainer(epochs=2, output_dir=str(tmp_path))
    calls = []

    def evaluator(params):
        calls.append(1)
        return float(len(calls))  # strictly improving → best always updates

    out = _fit_with_eval(trainer, _toy_triplets(32), evaluator)
    assert len(calls) == 2  # once per epoch
    assert out["best_score"] == 2.0
    assert (tmp_path / "best" / "meta.json").exists()


def _fit_with_eval(trainer, examples, evaluator):
    batcher = NoDuplicatesBatcher(examples, trainer.tc.batch_size)

    def batches():
        for batch in batcher:
            yield [ex.texts for ex in batch]

    return trainer.fit(batches, steps_per_epoch=len(batcher), evaluator=evaluator)


def test_checkpointing_and_retention(tmp_path):
    trainer = _make_trainer(epochs=2, checkpoint_steps=2, checkpoint_limit=2,
                            output_dir=str(tmp_path))
    _fit(trainer, _toy_triplets(48))
    import os
    ckpts = sorted(int(d) for d in os.listdir(tmp_path / "checkpoints"))
    assert len(ckpts) == 2  # retention pruned

    restored = load_checkpoint(
        str(tmp_path / "checkpoints" / str(ckpts[-1])),
        like_params={"model": trainer.params, "aux": trainer.aux})
    leaves_a = jax.tree.leaves(restored["model"])
    leaves_b = jax.tree.leaves(trainer.params)
    assert len(leaves_a) == len(leaves_b)


def test_learned_weightedmean_weights_train():
    trainer = _make_trainer(pooling="learned_weightedmean", epochs=1, lr=1e-2)
    assert "pos_weights" in trainer.aux
    before = np.asarray(trainer.aux["pos_weights"]).copy()
    _fit(trainer, _toy_triplets(32))
    after = np.asarray(trainer.aux["pos_weights"])
    assert not np.array_equal(before, after)


def test_learned_weights_train_even_under_bitfit():
    trainer = _make_trainer(pooling="learned_weightedmean", epochs=1, lr=1e-2,
                            freeze_nonbias=True)
    before = np.asarray(trainer.aux["pos_weights"]).copy()
    _fit(trainer, _toy_triplets(16))
    assert not np.array_equal(before, np.asarray(trainer.aux["pos_weights"]))


def test_dense_heads_train_and_export():
    trainer = _make_trainer(
        epochs=1, lr=1e-2,
        dense_heads=[{"in_features": 32, "out_features": 16,
                      "activation": "gelu", "location": "post_pool"}])
    before = np.asarray(trainer.aux["heads"][0]["w"]).copy()
    _fit(trainer, _toy_triplets(16))
    assert not np.array_equal(before, np.asarray(trainer.aux["heads"][0]["w"]))

    model = trainer.export_model()
    emb = model.encode(["exported model"])
    assert emb.shape == (1, 16)  # head output dim
