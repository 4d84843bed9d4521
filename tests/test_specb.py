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
