"""SPECB bracket-token semantics (ref: beir_dense_retriever.py:100-104,134-136,186-191)."""
import numpy as np

from sgpt_tpu.tokenization import SimpleTokenizer, SpecbCodec, encode_batch


def test_bracket_insertion_query_vs_doc():
    tok = SimpleTokenizer()
    codec = SpecbCodec(tok, max_seq_len=32, specb=True)
    q = codec.encode(["hello world"], is_query=True)
    d = codec.encode(["hello world"], is_query=False)
    base = tok.encode("hello world")
    assert list(q.input_ids[0][: len(base) + 2]) == tok.bracket_ids("[") + base + tok.bracket_ids("]")
    assert list(d.input_ids[0][: len(base) + 2]) == tok.bracket_ids("{") + base + tok.bracket_ids("}")
    # brackets are attended to
    assert q.attention_mask[0][: len(base) + 2].all()


def test_budget_reserves_two_tokens():
    tok = SimpleTokenizer()
    codec = SpecbCodec(tok, max_seq_len=8, specb=True)
    enc = codec.encode(["a b c d e f g h i j"], is_query=False)
    # 6-token budget + 2 brackets = 8 total
    assert enc.lengths[0] == 8
    assert enc.n_truncated == 1
    ids = list(enc.input_ids[0][:8])
    assert ids[0] == tok.bracket_ids("{")[0] and ids[-1] == tok.bracket_ids("}")[0]


def test_no_specb_plain_truncation():
    tok = SimpleTokenizer()
    enc = encode_batch(tok, ["a b c d e f g h i j"], max_seq_len=8)
    assert enc.lengths[0] == 8
    assert enc.attention_mask[0].sum() == 8


def test_padding_and_mask():
    tok = SimpleTokenizer()
    enc = encode_batch(tok, ["one two three", "one"], max_seq_len=32)
    assert enc.input_ids.shape == enc.attention_mask.shape
    assert enc.attention_mask[0].sum() == 3
    assert enc.attention_mask[1].sum() == 1
    assert (enc.input_ids[1][1:] == tok.pad_id).all()


def test_bucketing_static_shapes():
    tok = SimpleTokenizer()
    e1 = encode_batch(tok, ["a b c"], max_seq_len=2048)
    e2 = encode_batch(tok, ["a b c d e f g h"], max_seq_len=2048)
    assert e1.input_ids.shape[1] == 16   # bucket, not ragged
    assert e2.input_ids.shape[1] == 16
    e3 = encode_batch(tok, ["x " * 20], max_seq_len=2048)
    assert e3.input_ids.shape[1] == 32


def test_pad_to_override():
    tok = SimpleTokenizer()
    enc = encode_batch(tok, ["a b"], max_seq_len=64, pad_to=48)
    assert enc.input_ids.shape[1] == 48


def test_row_bucket_overshoot_clamped_at_cap():
    from sgpt_tpu.tokenization.specb import row_bucket
    # below the cap: <=25% round-up allowed (52 -> 64)
    assert row_bucket(52) == 64
    # at the cap bucket the engine passes allow_overshoot=False: never
    # dispatch more rows*tokens than the configured budget (advisor finding)
    assert row_bucket(52, allow_overshoot=False) == 32
    # exact bucket hits stay exact either way
    assert row_bucket(64, allow_overshoot=False) == 64
    assert row_bucket(64) == 64
    # tiny nmax with no smaller bucket: the raw count, not a round-up
    assert row_bucket(5, allow_overshoot=False) == 5
    assert row_bucket(7) == 8


def test_engine_rows_never_exceed_budget_at_cap():
    from sgpt_tpu.encoder import EmbeddingEngine
    from sgpt_tpu.models import tiny, init_params
    import jax
    cfg = tiny("neo")
    params = init_params(cfg, jax.random.key(0))
    eng = EmbeddingEngine(params, cfg, SimpleTokenizer(vocab_size=cfg.vocab_size),
                          batch_size=52, max_seq_len=64)
    for T in (16, 32, 64):
        B = eng._rows_for_bucket(T)
        if T == 64:  # cap bucket: hard budget
            assert B * T <= 52 * 64
        else:        # shorter buckets: bounded 25% overshoot
            assert B * T <= 52 * 64 * 1.25
