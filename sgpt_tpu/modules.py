"""Word-level encoder modules from the upstream sentence-transformers fork.

The SGPT fork ships the full upstream module zoo; the SGPT drivers never
reach BoW/CNN/LSTM/WordEmbeddings, but a user migrating a word-level ST
pipeline needs them. Clean-room JAX equivalents of:

  * models/tokenizer/WhitespaceTokenizer.py — punctuation-stripping word
    tokenizer with stop-word removal and the three-stage lookup
    (raw -> punctuation-stripped -> lowercased)
  * models/WordEmbeddings.py — fixed (or trainable) word-vector lookup
  * models/BoW.py — weighted bag-of-words sentence vectors
  * models/CNN.py — multi-kernel-size 1-D conv over token embeddings
  * models/LSTM.py — bidirectional LSTM with packed-sequence semantics

TPU-first shape discipline: tokenize() pads to static length buckets
(powers of two) so each bucket compiles once; forward passes are jit-pure
functions over explicit param pytrees (no module state). The LSTM backward
direction replicates torch's pack_padded_sequence semantics — it starts at
each row's LAST VALID token, not at the padding — via a per-row index flip.

CLIP lives in models/clip.py (text + ViT towers, HF-parity tested) and T5
is structural switches on the unified forward in models/decoder.py — both
shipped round 4; PARITY.md carries the per-module test citations.
"""
from __future__ import annotations

import string
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# the upstream fork's ENGLISH_STOP_WORDS (models/tokenizer/WordTokenizer.py)
# is sklearn's list; keep a compact common subset — callers pass their own
# list for exact parity with a specific upstream checkpoint
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the to "
    "was were will with".split())


class WhitespaceTokenizer:
    """Whitespace split + three-stage vocab lookup (raw, punctuation-stripped,
    lowercased), dropping stop words and OOV tokens — the upstream
    WhitespaceTokenizer.tokenize contract."""

    def __init__(self, vocab: Iterable[str] = (),
                 stop_words: Iterable[str] = ENGLISH_STOP_WORDS,
                 do_lower_case: bool = False):
        self.stop_words = set(stop_words)
        self.do_lower_case = do_lower_case
        self.vocab = list(vocab)
        self.word2idx = {w: i for i, w in enumerate(self.vocab)}

    def tokenize(self, text: str) -> List[int]:
        if self.do_lower_case:
            text = text.lower()
        out: List[int] = []
        for token in text.split():
            if token in self.stop_words:
                continue
            if token in self.word2idx:
                out.append(self.word2idx[token])
                continue
            token = token.strip(string.punctuation)
            if token in self.stop_words:
                continue
            if token and token in self.word2idx:
                out.append(self.word2idx[token])
                continue
            token = token.lower()
            if token in self.stop_words:
                continue
            if token in self.word2idx:
                out.append(self.word2idx[token])
        return out


class PhraseTokenizer(WhitespaceTokenizer):
    """Phrase-aware word tokenizer (models/tokenizer/PhraseTokenizer.py):
    vocab entries joined by `ngram_separator` (word2vec-style `New_York`) are
    detected in text — longest n-grams first, left to right — and emitted as
    one token. Lookup order follows the upstream phrase variant: raw ->
    lowercased -> punctuation-stripped (the plain WhitespaceTokenizer strips
    punctuation before lowering), each stage dropping stop words.

    Word splitting uses nltk's treebank word tokenizer when available (the
    upstream choice; `preserve_line=True` needs no downloaded data) and falls
    back to a punctuation-separating regex split otherwise."""

    def __init__(self, vocab: Iterable[str] = (),
                 stop_words: Iterable[str] = ENGLISH_STOP_WORDS,
                 do_lower_case: bool = False, ngram_separator: str = "_",
                 max_ngram_length: int = 5):
        super().__init__(vocab, stop_words, do_lower_case)
        self.ngram_separator = ngram_separator
        self.max_ngram_length = max_ngram_length
        self.ngram_lookup = set()
        self.ngram_lengths = set()
        for word in self.vocab:
            if ngram_separator and ngram_separator in word:
                n = word.count(ngram_separator) + 1
                # doubled separators mark malformed source vectors upstream
                if ngram_separator * 2 not in word and n <= max_ngram_length:
                    self.ngram_lookup.add(word)
                    self.ngram_lengths.add(n)

    @staticmethod
    def _word_split(text: str) -> List[str]:
        try:
            import nltk
            return nltk.word_tokenize(text, preserve_line=True)
        except Exception:
            import re
            return re.findall(r"\w+(?:[-']\w+)*|[^\w\s]", text)

    def tokenize(self, text: str) -> List[int]:
        if self.do_lower_case:
            text = text.lower()
        tokens = self._word_split(text)
        # merge phrases, longest n-grams first so 4-grams beat their bigrams
        for n in sorted(self.ngram_lengths, reverse=True):
            i = 0
            while i <= len(tokens) - n:
                ngram = self.ngram_separator.join(tokens[i : i + n])
                if ngram in self.ngram_lookup:
                    tokens[i : i + n] = [ngram]
                elif ngram.lower() in self.ngram_lookup:
                    tokens[i : i + n] = [ngram.lower()]
                i += 1
        out: List[int] = []
        for token in tokens:
            for stage in (token, token.lower(),
                          token.lower().strip(string.punctuation)):
                if stage in self.stop_words:
                    break
                if stage and stage in self.word2idx:
                    out.append(self.word2idx[stage])
                    break
        return out


# ---------------------------------------------------------------------------
# Dropout (sentence-embedding module)
# ---------------------------------------------------------------------------

def embedding_dropout(embeddings: jax.Array, rate: float,
                      key: Optional[jax.Array] = None,
                      deterministic: bool = True) -> jax.Array:
    """models/Dropout.py — dropout on the pooled sentence embedding. Inverted
    dropout (keep-scaled by 1/(1-p)), identity when deterministic or rate 0;
    a key is required only on the train path (explicit PRNG instead of the
    torch module's hidden RNG state — what makes GradCache replays exact)."""
    if deterministic or rate <= 0.0:
        return embeddings
    if key is None:
        raise ValueError("embedding_dropout(deterministic=False) needs a key")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, embeddings.shape)
    return jnp.where(mask, embeddings / keep, 0.0).astype(embeddings.dtype)


def _pad_bucket(n: int, cap: int = 1 << 14) -> int:
    b = 8
    while b < n and b < cap:
        b <<= 1
    return min(max(b, n), max(cap, n))


def batch_token_ids(tokenizer: WhitespaceTokenizer, texts: Sequence[str]):
    """(ids, mask, lengths) int32 arrays padded to a power-of-two bucket —
    static shapes so downstream jits compile once per bucket."""
    rows = [tokenizer.tokenize(t) or [0] for t in texts]
    lengths = np.asarray([len(r) for r in rows], np.int32)
    T = _pad_bucket(int(lengths.max()))
    ids = np.zeros((len(rows), T), np.int32)
    mask = np.zeros((len(rows), T), np.int32)
    for i, r in enumerate(rows):
        ids[i, :len(r)] = r
        mask[i, :len(r)] = 1
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(lengths)


# ---------------------------------------------------------------------------
# WordEmbeddings
# ---------------------------------------------------------------------------

def init_word_embeddings(weights) -> Dict[str, jax.Array]:
    """Param tree from a (V, D) word-vector matrix (models/WordEmbeddings.py:
    nn.Embedding loaded from pretrained vectors; trainability is the
    optimizer's choice here — BitFit-style masks, not a requires_grad flag)."""
    w = jnp.asarray(np.asarray(weights, np.float32))
    if w.ndim != 2:
        raise ValueError(f"expected (vocab, dim) weights, got {w.shape}")
    return {"emb": w}


@jax.jit
def word_embeddings_forward(params: Dict, ids: jax.Array) -> jax.Array:
    """(B, T) ids -> (B, T, D) token embeddings."""
    return jnp.take(params["emb"], ids, axis=0)


# ---------------------------------------------------------------------------
# BoW
# ---------------------------------------------------------------------------

class BoW:
    """Weighted bag-of-words sentence vectors (models/BoW.py): output dim =
    len(vocab); token weights default to 1 with a tf-idf style override map;
    `cumulative_term_frequency` sums repeated tokens (else binary-with-weight).

    Featurization is a host-side scatter by design — the reference computes
    the vector in get_sentence_features too; there is no device compute to
    fuse (the downstream similarity matmuls are where the FLOPs are)."""

    def __init__(self, vocab: Sequence[str],
                 word_weights: Optional[Dict[str, float]] = None,
                 unknown_word_weight: float = 1.0,
                 cumulative_term_frequency: bool = True):
        vocab = list(dict.fromkeys(vocab))  # unique, order-preserving
        self.vocab = vocab
        word_weights = word_weights or {}
        self.weights = np.asarray(
            [word_weights.get(w, word_weights.get(w.lower(),
                                                  unknown_word_weight))
             for w in vocab], np.float32)
        self.cumulative_term_frequency = cumulative_term_frequency
        self.tokenizer = WhitespaceTokenizer(vocab, stop_words=set(),
                                             do_lower_case=False)
        self.dim = len(vocab)

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, text in enumerate(texts):
            toks = np.asarray(self.tokenizer.tokenize(text), np.int64)
            if toks.size == 0:
                continue
            if self.cumulative_term_frequency:
                np.add.at(out[i], toks, self.weights[toks])
            else:
                out[i, toks] = self.weights[toks]
        return out


# ---------------------------------------------------------------------------
# CNN
# ---------------------------------------------------------------------------

def init_cnn(key, in_dim: int, out_channels: int = 256,
             kernel_sizes: Sequence[int] = (1, 3, 5)) -> Dict:
    """Multi-kernel conv bank (models/CNN.py): one Conv1d per kernel size,
    outputs concatenated -> (B, T, out_channels * len(kernel_sizes))."""
    params = {"convs": []}
    for ks in kernel_sizes:
        key, sub = jax.random.split(key)
        # torch Conv1d default init: U(-1/sqrt(fan_in), +) with fan_in = C_in*ks
        bound = 1.0 / np.sqrt(in_dim * ks)
        w = jax.random.uniform(sub, (out_channels, in_dim, ks), jnp.float32,
                               -bound, bound)
        key, sub = jax.random.split(key)
        b = jax.random.uniform(sub, (out_channels,), jnp.float32, -bound, bound)
        params["convs"].append({"w": w, "b": b})
    params["kernel_sizes"] = tuple(int(k) for k in kernel_sizes)
    return params


def cnn_forward(params: Dict, token_embeddings: jax.Array) -> jax.Array:
    """(B, T, D) -> (B, T, out_channels * n_kernels); torch 'same'-ish padding
    (k-1)//2 per side, stride 1 — identical output length for odd k."""
    x = jnp.transpose(token_embeddings, (0, 2, 1))          # (B, D, T) NCW
    outs = []
    for conv, ks in zip(params["convs"], params["kernel_sizes"]):
        pad = (ks - 1) // 2
        y = jax.lax.conv_general_dilated(
            x, conv["w"], window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NCH", "OIH", "NCH"))
        outs.append(y + conv["b"][None, :, None])
    return jnp.transpose(jnp.concatenate(outs, axis=1), (0, 2, 1))


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------

def init_lstm(key, in_dim: int, hidden_dim: int, num_layers: int = 1,
              bidirectional: bool = True) -> Dict:
    """Stacked (bi)LSTM params in torch's gate order i, f, g, o
    (models/LSTM.py wraps nn.LSTM; the HF-export path reuses this layout)."""
    layers = []
    n_dir = 2 if bidirectional else 1
    for layer in range(num_layers):
        d_in = in_dim if layer == 0 else hidden_dim * n_dir
        dirs = []
        for _ in range(n_dir):
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            bound = 1.0 / np.sqrt(hidden_dim)
            u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32,
                                                    -bound, bound)
            dirs.append({"w_ih": u(k1, (4 * hidden_dim, d_in)),
                         "w_hh": u(k2, (4 * hidden_dim, hidden_dim)),
                         "b_ih": u(k3, (4 * hidden_dim,)),
                         "b_hh": u(k4, (4 * hidden_dim,))})
        layers.append(dirs)
    return {"layers": layers, "hidden_dim": hidden_dim,
            "bidirectional": bidirectional}


def _lstm_scan(p, x, mask):
    """Unidirectional LSTM over (B, T, D) with a (B, T) validity mask: state
    freezes at masked steps (packed-sequence semantics for trailing pads)."""
    H = p["w_hh"].shape[1]
    B = x.shape[0]

    def step(carry, inp):
        h, c = carry
        xt, mt = inp                                        # (B, D), (B, 1)
        gates = xt @ p["w_ih"].T + h @ p["w_hh"].T + p["b_ih"] + p["b_hh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)           # torch gate order
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        h = jnp.where(mt.astype(bool), h_new, h)
        c = jnp.where(mt.astype(bool), c_new, c)
        return (h, c), h

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, hs = jax.lax.scan(step, init, (jnp.moveaxis(x, 1, 0),
                                      jnp.moveaxis(mask[..., None], 1, 0)))
    return jnp.moveaxis(hs, 0, 1)                           # (B, T, H)


def lstm_forward(params: Dict, token_embeddings: jax.Array,
                 lengths: jax.Array) -> jax.Array:
    """(B, T, D), (B,) lengths -> (B, T, H * n_dir).

    Packed-sequence parity with torch (models/LSTM.py:30-34): the reverse
    direction runs from each row's last valid token (per-row index flip),
    and outputs at padded positions are zero."""
    B, T, _ = token_embeddings.shape
    lengths = jnp.clip(lengths, 1, T)
    t_idx = jnp.arange(T)[None, :]
    mask = (t_idx < lengths[:, None]).astype(token_embeddings.dtype)
    x = token_embeddings
    for dirs in params["layers"]:
        outs = [_lstm_scan(dirs[0], x, mask)]
        if params["bidirectional"]:
            # flip each row's VALID prefix: index len-1-t for t < len
            flip = jnp.clip(lengths[:, None] - 1 - t_idx, 0, T - 1)
            xr = jnp.take_along_axis(x, flip[..., None], axis=1)
            hr = _lstm_scan(dirs[1], xr, mask)
            outs.append(jnp.take_along_axis(hr, flip[..., None], axis=1))
        x = jnp.concatenate(outs, axis=-1) * mask[..., None]
    return x
