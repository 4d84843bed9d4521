"""Word-level ST modules (modules.py) vs torch reference implementations.

The upstream fork wraps torch nn layers (models/{CNN,LSTM,WordEmbeddings,
BoW}.py); torch (CPU) is available here, so parity is tested directly against
the same nn ops with copied weights — the strongest evidence short of loading
a published checkpoint."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgpt_tpu.modules import (BoW, WhitespaceTokenizer, batch_token_ids,
                              cnn_forward, init_cnn, init_lstm,
                              init_word_embeddings, lstm_forward,
                              word_embeddings_forward)

torch = pytest.importorskip("torch")


def test_whitespace_tokenizer_three_stage_lookup():
    tok = WhitespaceTokenizer(["Hello", "world", "nlp"],
                              stop_words={"the"}, do_lower_case=False)
    # raw hit, punctuation-stripped hit, lowercased hit, stop word, OOV
    assert tok.tokenize("Hello world! NLP the xyz") == [0, 1, 2]
    # do_lower_case lowers BEFORE lookup: "Hello" no longer matches its
    # cased vocab entry (upstream behavior)
    tok2 = WhitespaceTokenizer(["hello"], stop_words=set(), do_lower_case=True)
    assert tok2.tokenize("HELLO Hello hello") == [0, 0, 0]


def test_bow_vectors():
    bow = BoW(["a", "b", "c"], word_weights={"b": 2.0},
              unknown_word_weight=1.0)
    v = bow.encode(["a a b", "c"])
    np.testing.assert_allclose(v, [[2.0, 2.0, 0.0], [0.0, 0.0, 1.0]])
    flat = BoW(["a", "b"], cumulative_term_frequency=False)
    np.testing.assert_allclose(flat.encode(["a a a b"]), [[1.0, 1.0]])


def test_word_embeddings_lookup_and_buckets():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(5, 8)).astype(np.float32)
    params = init_word_embeddings(w)
    tok = WhitespaceTokenizer(["w0", "w1", "w2", "w3", "w4"], stop_words=set())
    ids, mask, lengths = batch_token_ids(tok, ["w0 w3", "w4 w1 w2 w0 w4"])
    assert ids.shape[1] == 8          # power-of-two bucket
    np.testing.assert_array_equal(np.asarray(lengths), [2, 5])
    emb = np.asarray(word_embeddings_forward(params, ids))
    np.testing.assert_allclose(emb[0, 0], w[0])
    np.testing.assert_allclose(emb[1, 2], w[2])
    assert np.asarray(mask)[0, 2:].sum() == 0


def test_cnn_matches_torch_conv1d():
    B, T, D, C = 2, 16, 12, 7
    kernel_sizes = (1, 3, 5)
    params = init_cnn(jax.random.key(0), D, out_channels=C,
                      kernel_sizes=kernel_sizes)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, T, D)).astype(np.float32)

    got = np.asarray(cnn_forward(params, jnp.asarray(x)))

    xt = torch.tensor(x).transpose(1, 2)                  # (B, D, T)
    outs = []
    for conv_p, ks in zip(params["convs"], kernel_sizes):
        conv = torch.nn.Conv1d(D, C, ks, padding=(ks - 1) // 2)
        with torch.no_grad():
            conv.weight.copy_(torch.tensor(np.asarray(conv_p["w"])))
            conv.bias.copy_(torch.tensor(np.asarray(conv_p["b"])))
        outs.append(conv(xt))
    want = torch.cat(outs, 1).transpose(1, 2).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    assert got.shape == (B, T, C * len(kernel_sizes))


@pytest.mark.parametrize("bidirectional,num_layers", [(False, 1), (True, 1),
                                                      (True, 2)])
def test_lstm_matches_torch_packed(bidirectional, num_layers):
    """Ragged lengths through pack_padded_sequence — the reverse direction
    must start at each row's last VALID token."""
    B, T, D, H = 3, 10, 6, 5
    lengths = np.asarray([10, 4, 7])
    params = init_lstm(jax.random.key(2), D, H, num_layers=num_layers,
                       bidirectional=bidirectional)
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, T, D)).astype(np.float32)

    got = np.asarray(lstm_forward(params, jnp.asarray(x),
                                  jnp.asarray(lengths)))

    enc = torch.nn.LSTM(D, H, num_layers=num_layers,
                        bidirectional=bidirectional, batch_first=True)
    n_dir = 2 if bidirectional else 1
    with torch.no_grad():
        for layer in range(num_layers):
            for d in range(n_dir):
                p = params["layers"][layer][d]
                sfx = f"_l{layer}" + ("_reverse" if d else "")
                getattr(enc, f"weight_ih{sfx}").copy_(
                    torch.tensor(np.asarray(p["w_ih"])))
                getattr(enc, f"weight_hh{sfx}").copy_(
                    torch.tensor(np.asarray(p["w_hh"])))
                getattr(enc, f"bias_ih{sfx}").copy_(
                    torch.tensor(np.asarray(p["b_ih"])))
                getattr(enc, f"bias_hh{sfx}").copy_(
                    torch.tensor(np.asarray(p["b_hh"])))
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.tensor(x), torch.tensor(lengths), batch_first=True,
        enforce_sorted=False)
    out, _ = enc(packed)
    want = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=T)[0].detach().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lstm_cnn_compose_into_pooling():
    """The word-level stack composes with the repo's pooling (the upstream
    WordEmbeddings -> LSTM -> Pooling pipeline shape)."""
    from sgpt_tpu.ops.pooling import mean_pool

    tok = WhitespaceTokenizer([f"w{i}" for i in range(20)], stop_words=set())
    w = np.random.default_rng(4).normal(size=(20, 8)).astype(np.float32)
    ids, mask, lengths = batch_token_ids(
        tok, ["w1 w2 w3", "w4 w5 w6 w7 w8 w9"])
    emb = word_embeddings_forward(init_word_embeddings(w), ids)
    h = lstm_forward(init_lstm(jax.random.key(5), 8, 4), emb, lengths)
    pooled = mean_pool(h, mask)
    assert pooled.shape == (2, 8)
    assert np.isfinite(np.asarray(pooled)).all()


# ---------------------------------------------------------------------------
# round-5 tail: PhraseTokenizer, embedding dropout
# ---------------------------------------------------------------------------

def test_phrase_tokenizer_merges_ngrams():
    from sgpt_tpu.modules import PhraseTokenizer
    vocab = ["New_York", "New", "York", "is", "big", "city"]
    tok = PhraseTokenizer(vocab, stop_words={"is"})
    ids = tok.tokenize("New York is a big city")
    # "New York" merges to the phrase token; "is" is a stop word; "a" is OOV
    assert ids == [vocab.index("New_York"), vocab.index("big"),
                   vocab.index("city")]


def test_phrase_tokenizer_longest_ngram_wins_and_limits():
    from sgpt_tpu.modules import PhraseTokenizer
    vocab = ["a_b_c", "a_b", "c", "x__y", "one_two_three_four_five_six"]
    tok = PhraseTokenizer(vocab, stop_words=set())
    # trigram beats its bigram prefix
    assert tok.tokenize("a b c") == [vocab.index("a_b_c")]
    # doubled separator and >max_ngram_length entries are not phrases
    assert "x__y" not in tok.ngram_lookup
    assert "one_two_three_four_five_six" not in tok.ngram_lookup


def test_phrase_tokenizer_lookup_order():
    from sgpt_tpu.modules import PhraseTokenizer
    # phrase variant looks up raw -> lower -> lower+strip-punctuation
    vocab = ["Paris", "paris", "berlin"]
    tok = PhraseTokenizer(vocab, stop_words=set())
    assert tok.tokenize("Paris") == [vocab.index("Paris")]     # raw hit first
    assert tok.tokenize("PARIS") == [vocab.index("paris")]     # lower stage
    assert tok.tokenize("Berlin,") == [vocab.index("berlin")]  # strip stage
    # lowercase phrase fallback in the merge loop
    tok2 = PhraseTokenizer(["new_york"], stop_words=set())
    assert tok2.tokenize("New York") == [0]


def test_embedding_dropout_semantics():
    from sgpt_tpu.modules import embedding_dropout
    x = jnp.ones((16, 64), jnp.float32)
    # deterministic / rate-0: identity, no key needed
    np.testing.assert_array_equal(embedding_dropout(x, 0.5), x)
    np.testing.assert_array_equal(
        embedding_dropout(x, 0.0, deterministic=False), x)
    with pytest.raises(ValueError):
        embedding_dropout(x, 0.5, deterministic=False)
    y = np.asarray(embedding_dropout(x, 0.5, key=jax.random.key(0),
                                     deterministic=False))
    kept = y != 0.0
    assert 0.3 < kept.mean() < 0.7            # ~keep fraction
    np.testing.assert_allclose(y[kept], 2.0)  # inverted-dropout scale 1/(1-p)
