"""Multi-device training through the REAL trainer must equal single-device.

VERDICT r1 item 2: the reference's flagship capability is 8-GPU BitFit+GradCache
training (SentenceTransformer.py:691-741 DDP prepare + losses/
MultipleNegativesRankingLoss.py:57-73 distributed negatives). Here the same
fit runs on a (dp, tp) mesh via sharding annotations only — loss history and
final params must match the single-device run bit-for-tolerance.
"""
import numpy as np
import pytest

import jax

from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.parallel import make_mesh
from sgpt_tpu.tokenization import SimpleTokenizer
from sgpt_tpu.training import ContrastiveTrainer, TrainConfig


BATCHES = [
    [("anchor one text", "positive one body", "negative one body"),
     ("anchor two text", "positive two body", "negative two body"),
     ("anchor three text", "positive three body", "negative three body"),
     ("anchor four text", "positive four body", "negative four body"),
     ("anchor five text", "positive five body", "negative five body"),
     ("anchor six text", "positive six body", "negative six body"),
     ("anchor seven text", "positive seven body", "negative seven body"),
     ("anchor eight text", "positive eight body", "negative eight body")],
] * 3


def _fit(mesh=None, **tc_kw):
    cfg = tiny("neo", num_layers=2, hidden_size=32, num_heads=2, vocab_size=256)
    params = init_params(cfg, jax.random.key(0))
    tc = TrainConfig(batch_size=8, max_seq_len=16, epochs=1, lr=1e-3, **tc_kw)
    trainer = ContrastiveTrainer(params, cfg, SimpleTokenizer(vocab_size=256),
                                 tc, mesh=mesh)
    out = trainer.fit(lambda: iter(BATCHES), steps_per_epoch=len(BATCHES))
    losses = [h["loss"] for h in out["history"] if "loss" in h]
    flat = np.concatenate([np.ravel(np.asarray(x, np.float64))
                           for x in jax.tree.leaves(out["params"])])
    return losses, flat


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2), (2, 4)])
def test_mesh_fit_equals_single_device(dp, tp):
    ref_losses, ref_params = _fit(mesh=None)
    losses, params = _fit(mesh=make_mesh(dp=dp, tp=tp))
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-4)
    np.testing.assert_allclose(params, ref_params, rtol=3e-3, atol=2e-5)


def test_mesh_fit_gradcache_bitfit_equals_single_device():
    """The flagship combination: BitFit + GradCache on a dp×tp mesh."""
    kw = dict(use_gradcache=True, chunk_size=4, freeze_nonbias=True)
    ref_losses, ref_params = _fit(mesh=None, **kw)
    losses, params = _fit(mesh=make_mesh(dp=4, tp=2), **kw)
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-4)
    np.testing.assert_allclose(params, ref_params, rtol=3e-3, atol=2e-5)


def test_mesh_fit_trims_ragged_tail():
    """A tail batch not divisible by dp is trimmed, not crashed on."""
    cfg = tiny("neo", num_layers=1, hidden_size=32, num_heads=2, vocab_size=256)
    params = init_params(cfg, jax.random.key(0))
    trainer = ContrastiveTrainer(
        params, cfg, SimpleTokenizer(vocab_size=256),
        TrainConfig(batch_size=8, max_seq_len=16, lr=1e-3),
        mesh=make_mesh(dp=4, tp=2))
    ragged = [BATCHES[0], BATCHES[0][:6], BATCHES[0][:3]]  # 8, 6->4, 3->skip
    out = trainer.fit(lambda: iter(ragged), steps_per_epoch=3)
    losses = [h["loss"] for h in out["history"] if "loss" in h]
    assert len(losses) == 2  # 3-example tail skipped entirely
    assert all(np.isfinite(losses))


def test_gradcache_chunk_must_divide_dp():
    cfg = tiny("neo", num_layers=1, hidden_size=32, num_heads=2, vocab_size=256)
    with pytest.raises(ValueError, match="divisible by dp"):
        ContrastiveTrainer(
            init_params(cfg, jax.random.key(0)), cfg,
            SimpleTokenizer(vocab_size=256),
            TrainConfig(use_gradcache=True, chunk_size=6),
            mesh=make_mesh(dp=4, tp=2))
