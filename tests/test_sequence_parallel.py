"""Sequence-parallel decoder forward (ring attention) == plain forward."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.models.decoder import forward


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.asarray(jax.devices()), ("dp",))


@pytest.mark.parametrize("family", ["neo", "gptj", "bloom"])
def test_sp_forward_matches_plain(mesh, family):
    cfg = tiny(family, num_layers=2, hidden_size=32, num_heads=4,
               max_position_embeddings=128)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    B, T = 2, 64  # 8 tokens per shard on the 8-device mesh
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)), jnp.int32)
    mask = np.ones((B, T), np.int32)
    mask[1, 50:] = 0
    mask = jnp.asarray(mask)

    want = np.asarray(forward(params, ids, mask, cfg))
    got = np.asarray(forward(params, ids, mask, cfg, sp_mesh=mesh))
    m = np.asarray(mask)[:, :, None]
    assert (np.abs(got - want) * m).max() < 2e-4, (np.abs(got - want) * m).max()


def test_sp_forward_with_sharded_inputs(mesh):
    """Inputs pre-sharded over the sequence axis also work (serving layout)."""
    cfg = tiny("neo", num_layers=2, hidden_size=32, num_heads=4,
               max_position_embeddings=128)
    params = init_params(cfg, jax.random.key(1))
    ids = jnp.zeros((1, 64), jnp.int32)
    mask = jnp.ones((1, 64), jnp.int32)
    sh = NamedSharding(mesh, P(None, "dp"))
    ids_s = jax.device_put(ids, sh)
    mask_s = jax.device_put(mask, sh)
    got = np.asarray(forward(params, ids_s, mask_s, cfg, sp_mesh=mesh))
    want = np.asarray(forward(params, ids, mask, cfg))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_ring_attention_gradients_match_xla(mesh):
    """Ring attention is DIFFERENTIABLE (fori_loop + ppermute have transposes):
    dq/dk/dv equal the single-device XLA attention VJP — the prerequisite for
    sequence-parallel training (VERDICT r2 #6)."""
    from sgpt_tpu.ops.ring_attention import ring_attention

    rng = np.random.default_rng(5)
    B, H, T, Dh = 2, 2, 64, 16
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, T, Dh)), jnp.float32)
               for _ in range(3))
    key_mask = np.ones((B, T), np.int32)
    key_mask[1, 50:] = 0
    key_mask = jnp.asarray(key_mask)

    def loss_ring(q, k, v):
        out = ring_attention(q, k, v, key_mask, mesh=mesh, axis="dp",
                             scale=0.25)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.25
        i = jnp.arange(T)
        ok = (i[None, :] <= i[:, None])[None, None] & \
            key_mask[:, None, None, :].astype(bool)
        p = jax.nn.softmax(jnp.where(ok, s, -1e30), axis=-1)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", p, v) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_trainer_sp_mesh_matches_single_device(mesh):
    """ContrastiveTrainer(sp_mesh=): one fit step at T sharded 8-ways equals
    the single-device step (loss and updated params) — long-document
    contrastive fine-tuning (VERDICT r2 #6)."""
    from sgpt_tpu.tokenization import SimpleTokenizer
    from sgpt_tpu.training import ContrastiveTrainer, TrainConfig

    cfg = tiny("neo", num_layers=2, hidden_size=32, num_heads=4,
               vocab_size=256, max_position_embeddings=128).replace(
        dtype=jnp.float32)
    tok = SimpleTokenizer(vocab_size=256)
    params = init_params(cfg, jax.random.key(0))
    batch = [(" ".join(f"a{i}w{j}" for j in range(30)),
              " ".join(f"p{i}w{j}" for j in range(40)))
             for i in range(4)]
    tc = TrainConfig(batch_size=4, max_seq_len=64, lr=1e-3, epochs=1)

    t_single = ContrastiveTrainer(params, cfg, tok, tc)
    out_single = t_single.fit(lambda: iter([batch]), steps_per_epoch=1)

    t_sp = ContrastiveTrainer(params, cfg, tok, tc, sp_mesh=mesh)
    out_sp = t_sp.fit(lambda: iter([batch]), steps_per_epoch=1)

    assert abs(out_single["history"][0]["loss"]
               - out_sp["history"][0]["loss"]) < 1e-4
    for a, b in zip(jax.tree.leaves(out_single["params"]),
                    jax.tree.leaves(out_sp["params"])):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), atol=2e-4)


def test_trainer_sp_mesh_rejects_bad_seq_len(mesh):
    from sgpt_tpu.tokenization import SimpleTokenizer
    from sgpt_tpu.training import ContrastiveTrainer, TrainConfig
    cfg = tiny("neo")
    with pytest.raises(ValueError, match="divide"):
        ContrastiveTrainer(init_params(cfg, jax.random.key(0)), cfg,
                           SimpleTokenizer(vocab_size=cfg.vocab_size),
                           TrainConfig(max_seq_len=75), sp_mesh=mesh)


def test_tsdae_sp_mesh_matches_single_device(mesh):
    """TSDAE with sp_mesh: the tied encoder/decoder both ring-attend; loss
    and updated tree match the single-device step."""
    from sgpt_tpu.tokenization import SimpleTokenizer
    from sgpt_tpu.training.tsdae import TSDAETrainer

    cfg = tiny("neo", num_layers=2, hidden_size=32, num_heads=4,
               vocab_size=256, max_position_embeddings=128).replace(
        dtype=jnp.float32)
    tok = SimpleTokenizer(vocab_size=256)
    params = init_params(cfg, jax.random.key(0))
    pairs = [(" ".join(f"n{i}w{j}" for j in range(20)),
              " ".join(f"o{i}w{j}" for j in range(30))) for i in range(3)]

    single = TSDAETrainer(params, cfg, tok, max_seq_len=64, lr=1e-3)
    loss_single = single.train_batch(pairs)

    sp = TSDAETrainer(params, cfg, tok, max_seq_len=64, lr=1e-3, sp_mesh=mesh)
    loss_sp = sp.train_batch(pairs)
    # sp pads the decoder side to (T-1|sp)+1 = 65 — extra pads are masked out
    # of the loss, so values agree
    assert abs(loss_single - loss_sp) < 1e-4
