"""CE sequence packing: block-diagonal segments in one row must score exactly
like standalone rows.

The reference's fixed-row batching (crossencoder/beir/sgptce.py:168,214-217)
pads every short pair to the batch's max length; packing instead bin-packs
short (doc, query) requests several-per-row with segment-restricted attention
and per-segment positions. These tests pin the equality contract at all three
levels: decoder forward, fused scorer, and the ranker's public predict()."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from sgpt_tpu.crossencoder import CrossEncoderRanker, YesNoRanker
from sgpt_tpu.models import tiny, init_params
from sgpt_tpu.models.decoder import forward
from sgpt_tpu.ops.logprobs import (continuation_scores_gathered,
                                   continuation_scores_packed)
from sgpt_tpu.tokenization import SimpleTokenizer


def _pack_rows(rows, T):
    """Pack a list of 1-D int rows into one (1, T) packed row; returns the
    (ids, amask, posids, segids) arrays plus each segment's offset."""
    ids = np.zeros((1, T), np.int32)
    amask = np.zeros((1, T), np.int32)
    posids = np.zeros((1, T), np.int32)
    segids = np.full((1, T), -1, np.int32)
    offs = []
    off = 0
    for s, r in enumerate(rows):
        n = len(r)
        ids[0, off:off + n] = r
        amask[0, off:off + n] = 1
        posids[0, off:off + n] = np.arange(n)
        segids[0, off:off + n] = s
        offs.append(off)
        off += n
    return ids, amask, posids, segids, offs


@pytest.mark.parametrize("arch", ["gptj", "bloom", "neo"])
def test_packed_forward_matches_standalone(arch):
    """Hidden states at packed positions == each segment's standalone row,
    across all three position mechanisms (rope / ALiBi / learned)."""
    cfg = tiny(arch, num_layers=2, hidden_size=32, num_heads=4, vocab_size=64)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    rows = [rng.integers(0, 64, n) for n in (7, 11, 5)]
    ids, amask, posids, segids, offs = _pack_rows(rows, T=32)
    hp = np.asarray(forward(params, jnp.asarray(ids), jnp.asarray(amask), cfg,
                            position_ids=jnp.asarray(posids),
                            segment_ids=jnp.asarray(segids)), np.float32)
    for r, off in zip(rows, offs):
        hs = np.asarray(forward(params, jnp.asarray(r[None].astype(np.int32)),
                                jnp.ones((1, len(r)), jnp.int32), cfg),
                        np.float32)
        np.testing.assert_allclose(hp[0, off:off + len(r)], hs[0],
                                   rtol=2e-4, atol=2e-5)


def test_segment_ids_require_position_ids():
    cfg = tiny("gptj", num_layers=1, hidden_size=32, num_heads=2, vocab_size=64)
    params = init_params(cfg, jax.random.key(0))
    ids = jnp.zeros((1, 8), jnp.int32)
    with pytest.raises(ValueError, match="position_ids"):
        forward(params, ids, jnp.ones_like(ids), cfg,
                segment_ids=jnp.zeros_like(ids))


def test_continuation_scores_packed_matches_gathered():
    """Per-segment packed scores == each request scored on its own row."""
    cfg = tiny("gptj", num_layers=2, hidden_size=32, num_heads=4, vocab_size=128)
    params = init_params(cfg, jax.random.key(1))
    rng = np.random.default_rng(1)
    # 2 packed rows x 3 segments, ragged lengths and continuation windows
    T, C, S = 48, 16, 4
    reqs = [[(rng.integers(0, 128, n), c) for n, c in segs]
            for segs in (((9, 3), (13, 5), (6, 2)), ((15, 4), (8, 8), (10, 1)))]
    B = len(reqs)
    ids = np.zeros((B, T), np.int32)
    amask = np.zeros((B, T), np.int32)
    posids = np.zeros((B, T), np.int32)
    segids = np.full((B, T), -1, np.int32)
    cpos = np.zeros((B, C), np.int32)
    ctgt = np.zeros((B, C), np.int32)
    cmask = np.zeros((B, C), np.float32)
    cseg = np.zeros((B, C), np.int32)
    want = np.zeros((B, S), np.float64)
    for b, segs in enumerate(reqs):
        off = cslot = 0
        for s, (row, contlen) in enumerate(segs):
            n = len(row)
            ids[b, off:off + n] = row
            amask[b, off:off + n] = 1
            posids[b, off:off + n] = np.arange(n)
            segids[b, off:off + n] = s
            cpos[b, cslot:cslot + contlen] = np.arange(off + n - contlen, off + n)
            ctgt[b, cslot:cslot + contlen] = row[n - contlen:]
            cmask[b, cslot:cslot + contlen] = 1.0
            cseg[b, cslot:cslot + contlen] = s
            # standalone-row oracle via the production bucket-path scorer
            scp = np.zeros((1, C), np.int32)
            sct = np.zeros((1, C), np.int32)
            scm = np.zeros((1, C), np.float32)
            scp[0, :contlen] = np.arange(n - contlen, n)
            sct[0, :contlen] = row[n - contlen:]
            scm[0, :contlen] = 1.0
            want[b, s] = float(continuation_scores_gathered(
                params, jnp.asarray(row[None].astype(np.int32)),
                jnp.ones((1, n), jnp.int32), jnp.asarray(scp),
                jnp.asarray(sct), jnp.asarray(scm), cfg)[0])
            cslot += contlen
            off += n
    got = np.asarray(continuation_scores_packed(
        params, jnp.asarray(ids), jnp.asarray(amask), jnp.asarray(posids),
        jnp.asarray(segids), jnp.asarray(cpos), jnp.asarray(ctgt),
        jnp.asarray(cmask), jnp.asarray(cseg), cfg, S), np.float64)
    np.testing.assert_allclose(got[:, :3], want[:, :3], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(got[:, 3], 0.0)  # unused segment slot


def _ragged_pairs(n=24):
    """Query/doc mix whose packed rows span both the packed and bucket paths."""
    rng = np.random.default_rng(7)
    pairs = []
    for i in range(n):
        qlen = int(rng.integers(1, 5))
        dlen = int(rng.integers(2, 40)) if i % 3 else int(rng.integers(60, 90))
        pairs.append((" ".join(f"q{i} t{j}" for j in range(qlen)),
                      " ".join(f"d{i} w{j}" for j in range(dlen))))
    # duplicates exercise the shared-score fan-out on the packed path
    pairs[5] = pairs[2]
    pairs[11] = pairs[2]
    return pairs


@pytest.mark.parametrize("arch", ["gptj", "bloom"])
def test_ranker_pack_t_score_equality(arch):
    """predict() with pack_t == predict() without, on a ragged mix where some
    requests pack and the long tail stays on the bucket path."""
    cfg = tiny(arch, vocab_size=512)
    params = init_params(cfg, jax.random.key(2))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    pairs = _ragged_pairs()
    base = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=128)
    packed = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=128,
                                pack_t=64)
    got = packed.predict(pairs)
    want = base.predict(pairs)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)
    # dedup fan-out survived the packed path
    assert got[5] == got[2] == got[11]


def test_ranker_pack_t_all_short():
    """Every request fits the packed path; the bucket loop must not run on an
    empty key list."""
    cfg = tiny("gptj", vocab_size=512)
    params = init_params(cfg, jax.random.key(3))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    pairs = [(f"q{i}", f"d{i} body") for i in range(7)]
    base = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=128)
    packed = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=128,
                                pack_t=128)
    np.testing.assert_allclose(packed.predict(pairs), base.predict(pairs),
                               rtol=2e-4, atol=1e-4)


def test_yesno_ranker_packs_with_vocab_mask():
    """YesNoRanker's restricted-softmax scores survive packing (the vocab mask
    applies inside each packed segment's log_softmax identically)."""
    cfg = tiny("gptj", vocab_size=512)
    params = init_params(cfg, jax.random.key(4))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    pairs = [(f"query {i}", f"document {i} about topic {i}") for i in range(6)]
    base = YesNoRanker(params, cfg, tok, batch_size=4, max_length=128)
    packed = YesNoRanker(params, cfg, tok, batch_size=4, max_length=128,
                         pack_t=128)
    np.testing.assert_allclose(packed.predict(pairs), base.predict(pairs),
                               rtol=2e-4, atol=1e-4)


def test_ranker_pack_t_mesh_dp():
    """Packed scoring under a dp mesh == single-device packed scoring."""
    devs = np.array(jax.devices()[:4]).reshape(4, 1)
    mesh = Mesh(devs, ("dp", "tp"))
    cfg = tiny("gptj", vocab_size=512)
    params = init_params(cfg, jax.random.key(5))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    pairs = _ragged_pairs(16)
    single = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=128,
                                pack_t=64)
    sharded = CrossEncoderRanker(params, cfg, tok, batch_size=4, max_length=128,
                                 pack_t=64, mesh=mesh)
    np.testing.assert_allclose(sharded.predict(pairs), single.predict(pairs),
                               rtol=2e-4, atol=1e-4)


def test_pack_t_validation():
    cfg = tiny("gptj", vocab_size=512)
    params = init_params(cfg, jax.random.key(6))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    with pytest.raises(ValueError, match="pack_t"):
        CrossEncoderRanker(params, cfg, tok, pack_t=8)
    with pytest.raises(ValueError, match="pack_t"):
        CrossEncoderRanker(params, cfg, tok,
                           pack_t=cfg.max_position_embeddings + 1)


# ---------------------------------------------------------------------------
# round-5: packed rows keep the fused Pallas kernel (segment masks in-kernel)
# ---------------------------------------------------------------------------

def test_ranker_pack_t_fused_kernel_equality():
    """pack_t inside the fused window (160 <= T <= 512): packed rows now ride
    the Pallas short-attention kernel with block-diagonal segment masks —
    scores must equal the XLA path's exactly."""
    cfg = tiny("gptj", vocab_size=512, max_position_embeddings=256)
    params = init_params(cfg, jax.random.key(7))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    pairs = _ragged_pairs(12)
    base = CrossEncoderRanker(params, cfg, tok, batch_size=4,
                              max_length=192, pack_t=192)
    fused = CrossEncoderRanker(params, cfg.replace(fused_attention=True), tok,
                               batch_size=4, max_length=192, pack_t=192)
    np.testing.assert_allclose(fused.predict(pairs), base.predict(pairs),
                               rtol=2e-4, atol=1e-4)


def test_ranker_pack_t_mesh_dp_fused():
    """Pure-dp mesh + fused kernel: the packed scorer must route through the
    dp shard_map wrapper (pallas_call has no GSPMD partitioning rule), and
    sharded packed scores == single-device packed scores."""
    devs = np.array(jax.devices()[:4]).reshape(4, 1)
    mesh = Mesh(devs, ("dp", "tp"))
    cfg = tiny("gptj", vocab_size=512,
               max_position_embeddings=256).replace(fused_attention=True)
    params = init_params(cfg, jax.random.key(8))
    tok = SimpleTokenizer(vocab_size=cfg.vocab_size)
    pairs = _ragged_pairs(16)
    single = CrossEncoderRanker(params, cfg, tok, batch_size=4,
                                max_length=192, pack_t=192)
    sharded = CrossEncoderRanker(params, cfg, tok, batch_size=4,
                                 max_length=192, pack_t=192, mesh=mesh)
    np.testing.assert_allclose(sharded.predict(pairs), single.predict(pairs),
                               rtol=2e-4, atol=1e-4)
    assert sharded._packed_mesh_fns  # the shard_map wrapper actually ran
