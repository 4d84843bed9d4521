"""Mesh + TP sharding: the decoder must produce identical results sharded vs not,
and params must actually partition (dp×tp over the 8 virtual CPU devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.models.decoder import forward
from sgpt_tpu.parallel import make_mesh, param_specs, shard_params, data_spec


def test_make_mesh_shapes():
    m = make_mesh(dp=4, tp=2)
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("dp", "tp")
    m2 = make_mesh(dp=-1, tp=2)
    assert m2.devices.shape == (4, 2)


def test_param_specs_cover_tree():
    cfg = tiny("bloom")
    params = init_params(cfg, jax.random.key(0))
    specs = param_specs(params)
    assert specs["layers"]["attn"]["wq"] == P(None, None, "tp")
    assert specs["layers"]["attn"]["wo"] == P(None, "tp", None)
    assert specs["layers"]["mlp"]["wi"] == P(None, None, "tp")
    assert specs["layers"]["mlp"]["wo"] == P(None, "tp", None)
    assert specs["layers"]["ln1"]["scale"] == P(None, None)
    assert specs["wte"] == P(None, "tp")


def test_sharded_forward_matches_single_device():
    cfg = tiny("neo", num_heads=4, hidden_size=64)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(8, 12)), jnp.int32)
    mask = jnp.ones((8, 12), jnp.int32)

    want = np.asarray(forward(params, ids, mask, cfg))

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, mesh)
    ids_s = jax.device_put(ids, NamedSharding(mesh, data_spec()))
    mask_s = jax.device_put(mask, NamedSharding(mesh, data_spec()))
    got = np.asarray(forward(sharded, ids_s, mask_s, cfg))

    np.testing.assert_allclose(got, want, atol=1e-5)
    # params are genuinely partitioned: a tp-sharded leaf has per-device shards
    leaf = sharded["layers"]["attn"]["wq"]
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert all(s[-1] == leaf.shape[-1] // 4 for s in shard_shapes)


def test_engine_dp_sharded_encode_matches_single():
    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    texts = [f"document number {i} some words" for i in range(10)]

    single = EmbeddingEngine(params, cfg, tok, batch_size=8).encode(texts)
    mesh = make_mesh(dp=8, tp=1)
    sharded = EmbeddingEngine(shard_params(params, mesh), cfg, tok,
                              batch_size=8, mesh=mesh).encode(texts)
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_quantized_sharded_forward_matches_single_device():
    """int8-quantized params compose with Megatron TP: the {q, s} leaves get
    partition specs (q follows the kernel, scales follow column shards) and
    the sharded quantized forward is bit-identical to the unsharded one."""
    from sgpt_tpu.ops.quant import quantize_decoder_params

    cfg = tiny("neo", num_heads=4, hidden_size=64)
    params = quantize_decoder_params(init_params(cfg, jax.random.key(0)))
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(8, 12)), jnp.int32)
    mask = jnp.ones((8, 12), jnp.int32)

    want = np.asarray(forward(params, ids, mask, cfg))

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_params(params, mesh)
    ids_s = jax.device_put(ids, NamedSharding(mesh, data_spec()))
    mask_s = jax.device_put(mask, NamedSharding(mesh, data_spec()))
    got = np.asarray(forward(sharded, ids_s, mask_s, cfg))

    np.testing.assert_allclose(got, want, atol=1e-5)
    q = sharded["layers"]["attn"]["wq"]["q"]
    assert all(s.data.shape[-1] == q.shape[-1] // 4
               for s in q.addressable_shards)
    s_scale = sharded["layers"]["attn"]["wq"]["s"]
    assert all(sh.data.shape[-1] == s_scale.shape[-1] // 4
               for sh in s_scale.addressable_shards)


def test_dp_mesh_fused_attention_encode_matches_single():
    """Pure-dp mesh + fused_attention: the embed step runs under shard_map
    (the Pallas kernel has no SPMD rule under plain jit) and must equal the
    single-device fused encode."""
    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.parallel import make_mesh
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("neo", num_layers=2, hidden_size=64, num_heads=4,
               vocab_size=256, max_position_embeddings=256)
    tok = SimpleTokenizer(vocab_size=256)
    params = init_params(cfg, jax.random.key(0))
    texts = [f"text number {i} body" for i in range(19)]

    single = EmbeddingEngine(params, cfg, tok, batch_size=8, max_seq_len=176,
                             fused_attention=True,
                             normalize_embeddings=True).encode(texts)
    mesh = make_mesh(dp=8)
    eng = EmbeddingEngine(params, cfg, tok, batch_size=8, max_seq_len=176,
                          mesh=mesh, fused_attention=True,
                          normalize_embeddings=True)
    assert eng._mesh_step is not None          # shard_map path active
    sharded = eng.encode(texts)
    np.testing.assert_allclose(sharded, single, atol=2e-5)


def _tiny_ce_setup(vocab=256):
    from sgpt_tpu.tokenization import SimpleTokenizer
    cfg = tiny("neo", num_layers=2, hidden_size=64, num_heads=4,
               vocab_size=vocab, max_position_embeddings=128)
    params = init_params(cfg, jax.random.key(0))
    tok = SimpleTokenizer(vocab_size=vocab)
    pairs = [("what is topic %d" % i,
              " ".join(f"word{j}" for j in range(3 + 5 * (i % 4))))
             for i in range(11)]
    pairs.append(pairs[0])  # dedup path must still fan scores back out
    return params, cfg, tok, pairs


def test_ce_dp_sharded_scores_match_single():
    """CrossEncoderRanker(mesh=): rerank scoring shards rows over dp and must
    equal the single-device scores (the reference's only multi-device
    inference is exactly the CE, sgptce.py:54-60)."""
    from sgpt_tpu.crossencoder import CrossEncoderRanker

    params, cfg, tok, pairs = _tiny_ce_setup()
    single = CrossEncoderRanker(params, cfg, tok, batch_size=8,
                                max_length=64).predict(pairs)
    mesh = make_mesh(dp=8)
    ranker = CrossEncoderRanker(shard_params(params, mesh), cfg, tok,
                                batch_size=8, max_length=64, mesh=mesh)
    sharded = ranker.predict(pairs)
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-5)


def test_ce_tp_sharded_scores_match_single():
    """dp×tp mesh: TP param shards + dp row shards through plain jit."""
    from sgpt_tpu.crossencoder import CrossEncoderRanker

    params, cfg, tok, pairs = _tiny_ce_setup()
    single = CrossEncoderRanker(params, cfg, tok, batch_size=8,
                                max_length=64).predict(pairs)
    mesh = make_mesh(dp=2, tp=4)
    ranker = CrossEncoderRanker(shard_params(params, mesh), cfg, tok,
                                batch_size=8, max_length=64, mesh=mesh)
    sharded = ranker.predict(pairs)
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-5)


def test_ce_dp_fused_shard_map_path_matches_single():
    """Pure-dp + fused attention: the scorer runs under shard_map."""
    from sgpt_tpu.crossencoder import CrossEncoderRanker

    params, cfg, tok, pairs = _tiny_ce_setup()
    cfg_f = cfg.replace(fused_attention=True)
    single = CrossEncoderRanker(params, cfg_f, tok, batch_size=8,
                                max_length=64).predict(pairs)
    mesh = make_mesh(dp=8)
    ranker = CrossEncoderRanker(shard_params(params, mesh), cfg_f, tok,
                                batch_size=8, max_length=64, mesh=mesh)
    assert ranker._mesh_score is not None
    sharded = ranker.predict(pairs)
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-5)


def test_yesno_dp_sharded_matches_single():
    """Vocab-restricted Yes/No scorer over the dp mesh (vocab mask is a
    closed-over constant inside the shard_map scorer)."""
    from sgpt_tpu.crossencoder import YesNoRanker

    params, cfg, tok, pairs = _tiny_ce_setup()
    single = YesNoRanker(params, cfg, tok, batch_size=8,
                         max_length=64).predict(pairs)
    mesh = make_mesh(dp=8)
    sharded = YesNoRanker(shard_params(params, mesh), cfg, tok, batch_size=8,
                          max_length=64, mesh=mesh).predict(pairs)
    np.testing.assert_allclose(sharded, single, rtol=2e-5, atol=2e-5)


def test_fused_attention_under_tp_mesh_matches_single():
    """tp>1 + fused attention: the kernel runs per head-shard via a nested
    shard_map inside the jitted forward (VERDICT r2 #5 — it used to fall back
    to XLA exactly where TP made it legal at flagship width)."""
    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.tokenization import SimpleTokenizer

    cfg = tiny("neo", num_layers=2, hidden_size=64, num_heads=4,
               vocab_size=256, max_position_embeddings=256)
    tok = SimpleTokenizer(vocab_size=256)
    params = init_params(cfg, jax.random.key(0))
    texts = [f"text number {i} body words" for i in range(19)]

    single = EmbeddingEngine(params, cfg, tok, batch_size=8, max_seq_len=176,
                             fused_attention=True,
                             normalize_embeddings=True).encode(texts)
    for dp, tp in ((2, 4), (4, 2)):
        mesh = make_mesh(dp=dp, tp=tp)
        eng = EmbeddingEngine(shard_params(params, mesh), cfg, tok,
                              batch_size=8, max_seq_len=176, mesh=mesh,
                              fused_attention=True, normalize_embeddings=True)
        assert eng._tp_mesh is mesh and eng._mesh_step is None
        got = eng.encode(texts)
        np.testing.assert_allclose(got, single, atol=2e-5)


def test_fused_tp_decoder_forward_direct():
    """Direct decoder check at a T inside the fused window with TP params."""
    cfg = tiny("neo", num_heads=4, hidden_size=64, vocab_size=128,
               max_position_embeddings=256).replace(fused_attention=True)
    params = init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(3)
    T = 176
    ids = jnp.asarray(rng.integers(0, 128, (4, T)), jnp.int32)
    mask = jnp.asarray((rng.random((4, T)) < 0.9).astype(np.int32))
    mask = mask.at[:, 0].set(1)
    want = np.asarray(forward(params, ids, mask, cfg))

    mesh = make_mesh(dp=2, tp=2)
    sharded = shard_params(params, mesh)
    from jax.sharding import NamedSharding
    from sgpt_tpu.parallel import data_spec
    ids_s = jax.device_put(ids, NamedSharding(mesh, data_spec()))
    mask_s = jax.device_put(mask, NamedSharding(mesh, data_spec()))
    got = np.asarray(forward(sharded, ids_s, mask_s, cfg, tp_mesh=mesh))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_vmem_gate_opens_under_tp_at_gptj_width():
    """The round-2 gap: GPT-J's HD=4096 fails the VMEM gate at T=304, but the
    per-shard width at tp=2 (2048) passes — TP makes the kernel legal at
    flagship width (models/decoder.py gate; short_attention.fwd_fits_vmem)."""
    from sgpt_tpu.ops.pallas.short_attention import fwd_fits_vmem
    assert not fwd_fits_vmem(304, 4096, 2)   # full GPT-J width: overflow
    assert fwd_fits_vmem(304, 2048, 2)       # tp=2 head shard: fits
    assert fwd_fits_vmem(304, 1024, 2)       # tp=4


def test_ce_tp_fused_scores_match_single():
    """CE under a tp mesh keeps the fused kernel (per head-shard) and must
    match single-device scores."""
    from sgpt_tpu.crossencoder import CrossEncoderRanker

    params, cfg, tok, pairs = _tiny_ce_setup()
    cfg_f = cfg.replace(fused_attention=True)
    # max_length 192 puts the packed rows inside the fused 160..512 window
    pairs = [(q, d + " " + " ".join(f"pad{j}" for j in range(150)))
             for q, d in pairs[:6]]
    single = CrossEncoderRanker(params, cfg_f, tok, batch_size=4,
                                max_length=192).predict(pairs)
    mesh = make_mesh(dp=2, tp=2)
    ranker = CrossEncoderRanker(shard_params(params, mesh), cfg_f, tok,
                                batch_size=4, max_length=192, mesh=mesh)
    assert ranker._tp_mesh is mesh and ranker._mesh_score is None
    got = ranker.predict(pairs)
    np.testing.assert_allclose(got, single, rtol=3e-5, atol=3e-5)


# ---------------------------------------------------------------------------
# Multi-slice topology arrangement (parallel/mesh.arrange_devices)
# ---------------------------------------------------------------------------

class _StubDev:
    """Fake device carrying the TPU topology attributes mesh.py reads."""
    def __init__(self, i, slice_index=None, coords=None):
        self.id = i
        if slice_index is not None:
            self.slice_index = slice_index
        if coords is not None:
            self.coords = coords

    def __repr__(self):
        return f"D{self.id}"


def _ids(arr):
    return [[d.id for d in row] for row in arr]


def test_arrange_multislice_tp_stays_on_ici():
    """2 slices x 4 chips, tp=2: every tp pair is same-slice; dp rows are
    slice-major (rows 0-1 slice 0, rows 2-3 slice 1)."""
    from sgpt_tpu.parallel.mesh import arrange_devices

    devs = [_StubDev(i, slice_index=i // 4) for i in range(8)]
    arr = arrange_devices(devs, dp=4, tp=2)
    assert arr.shape == (4, 2)
    for row in arr:
        assert len({d.slice_index for d in row}) == 1  # tp never crosses DCN
    assert [d.slice_index for d in arr[:, 0]] == [0, 0, 1, 1]  # slice-major dp


def test_arrange_multislice_interleaved_input_order():
    """Device list arriving interleaved across slices still groups correctly."""
    from sgpt_tpu.parallel.mesh import arrange_devices

    devs = [_StubDev(i, slice_index=i % 2) for i in range(8)]  # 0,1,0,1,...
    arr = arrange_devices(devs, dp=4, tp=2)
    for row in arr:
        assert len({d.slice_index for d in row}) == 1
    # all 8 devices present exactly once
    assert sorted(d.id for row in arr for d in row) == list(range(8))


def test_arrange_rejects_tp_across_dcn():
    from sgpt_tpu.parallel.mesh import arrange_devices

    devs = [_StubDev(i, slice_index=i // 4) for i in range(8)]
    with pytest.raises(ValueError, match="ICI"):
        arrange_devices(devs, dp=1, tp=8)   # tp=8 > slice size 4


def test_arrange_rejects_uneven_slices():
    from sgpt_tpu.parallel.mesh import arrange_devices

    devs = ([_StubDev(i, slice_index=0) for i in range(4)]
            + [_StubDev(4 + i, slice_index=1) for i in range(2)])
    with pytest.raises(ValueError, match="uneven"):
        arrange_devices(devs, dp=3, tp=2)


def test_arrange_single_slice_plain_reshape():
    """No slice_index (CPU/virtual devices): row-major reshape, old behavior."""
    from sgpt_tpu.parallel.mesh import arrange_devices

    devs = [_StubDev(i) for i in range(8)]
    arr = arrange_devices(devs, dp=2, tp=4)
    assert _ids(arr) == [[0, 1, 2, 3], [4, 5, 6, 7]]


def test_make_mesh_virtual_devices_still_works():
    """Integration: the virtual 8-device CPU mesh builds and runs a psum."""
    from sgpt_tpu.parallel import make_mesh
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    x = jnp.arange(8.0).reshape(4, 2)
    y = jax.jit(jax.shard_map(lambda a: jax.lax.psum(a, "dp"), mesh=mesh,
                              in_specs=P("dp", "tp"), out_specs=P(None, "tp"),
                              check_vma=False))(x)
    np.testing.assert_allclose(np.asarray(y)[0], [0 + 2 + 4 + 6, 1 + 3 + 5 + 7])
