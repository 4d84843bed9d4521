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


def test_encode_batch_matches_per_text():
    """Batched tokenize (encode_rows' one-call path) == per-text encode:
    SimpleTokenizer's memoized batch, the subclass-override guard, and a
    fake fast-HF tokenizer through the HFTokenizer adapter."""
    from sgpt_tpu.tokenization import HFTokenizer
    from sgpt_tpu.tokenization.specb import SpecbCodec

    tok = SimpleTokenizer(vocab_size=512)
    texts = ["the cat sat", "THE CAT", "", "cat cat cat", "dog\nbird"]
    assert tok.encode_batch(texts) == [tok.encode(t) for t in texts]

    class _Shifted(SimpleTokenizer):
        def encode(self, text):
            return [i + 1 for i in super().encode(text)]

    sh = _Shifted(vocab_size=512)
    assert sh.encode_batch(texts) == [sh.encode(t) for t in texts]

    class _FakeFastHF:
        """Mimics a HF fast tokenizer: batched __call__ + tokenize pair."""
        is_fast = True
        pad_token = "<pad>"
        eos_token = "<eos>"
        pad_token_id = 0
        eos_token_id = 1

        def __len__(self):
            return 512

        def _ids(self, text):
            return [2 + (len(w) % 97) for w in text.split()]

        def tokenize(self, text):
            return text.split()

        def convert_tokens_to_ids(self, toks):
            return [2 + (len(w) % 97) for w in toks]

        def __call__(self, texts, add_special_tokens):
            assert add_special_tokens is False
            assert isinstance(texts, list)
            return {"input_ids": [self._ids(t) for t in texts]}

        def encode(self, text):  # bracket_ids path
            return self._ids(text)

    hf = HFTokenizer(_FakeFastHF())
    assert hf.encode_batch(texts) == [hf.encode(t) for t in texts]

    # through the codec: batched path == a codec over a per-text-only stub
    codec = SpecbCodec(tok, max_seq_len=16, specb=True)

    class _NoBatch:
        vocab_size = tok.vocab_size
        eos_id = tok.eos_id
        pad_id = tok.pad_id
        encode = staticmethod(tok.encode)
        bracket_ids = staticmethod(tok.bracket_ids)

    codec2 = SpecbCodec(_NoBatch(), max_seq_len=16, specb=True)
    for is_query in (False, True):
        r1, n1, t1 = codec.encode_rows(texts, is_query=is_query)
        r2, n2, t2 = codec2.encode_rows(texts, is_query=is_query)
        assert r1 == r2 and n1 == n2 and t1 == t2
