"""TSDAE — denoising auto-encoder pretraining for sentence embeddings.

Parity target: sentence_transformers/losses/DenoisingAutoEncoderLoss.py
(exported at losses/__init__.py:12) with tie_encoder_decoder=True, the
configuration the TSDAE paper recommends:

  * the ENCODER embeds the noisy sentence (deletion noise,
    datasets/DenoisingAutoEncoderDataset.py → data/datasets.denoise_text),
  * a DECODER sharing the encoder's weights reconstructs the ORIGINAL
    sentence autoregressively, conditioned on the sentence embedding via
    cross-attention to a single encoder token (reps[:, None],
    DenoisingAutoEncoderLoss.py:121-128),
  * loss = token cross-entropy on the shifted original, pads ignored
    (ignore_index=pad_token_id, :133-135).

TPU-native mapping: cross-attention over ONE key degenerates exactly to a
query-independent learned projection of the embedding (softmax of a single
logit is 1), so the decoder here is the SAME scan-stacked GPT forward with a
per-layer (D, D) conditioning projection added into the residual
(models/decoder.forward cond/cond_params). Weight tying is free: the encoder
and decoder literally share the params pytree, and gradients flow through
both paths.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.config import DecoderConfig
from ..models.decoder import forward, logits
from ..ops.pooling import POOLERS


def init_tsdae_params(cfg: DecoderConfig, key: jax.Array) -> dict:
    """Per-layer conditioning projections {"w": (L, D, D), "b": (L, D)} —
    the (degenerate) cross-attention weights, trained from scratch like HF's
    add_cross_attention modules."""
    D, L = cfg.hidden_size, cfg.num_layers
    return {"w": 0.02 * jax.random.normal(key, (L, D, D), jnp.float32),
            "b": jnp.zeros((L, D), jnp.float32)}


@partial(jax.jit, static_argnames=("cfg", "pooling", "sp_mesh"))
def tsdae_loss(params, tsdae_params, src_ids, src_mask, tgt_ids, tgt_mask,
               cfg: DecoderConfig, pooling: str = "weightedmean",
               sp_mesh=None) -> jax.Array:
    """Encoder(noisy) → rep; tied decoder reconstructs the original.

    src_*: the noisy sentence (encoder input); tgt_*: the original.
    Decoder input = tgt[:-1], labels = tgt[1:]; pad label positions are
    excluded from the mean (the reference's ignore_index CE). The decoder
    attends with a full (all-ones) mask like the reference's
    attention_mask=None — right-pads are causally invisible to real tokens.

    sp_mesh: long-document TSDAE — both the encoder and the tied decoder run
    ring attention with T sharded over the mesh (attention AND its backward;
    the reconstruction sequence length is T-1, so the decoder side requires
    (max_seq_len - 1) %% sp == 0 — TSDAETrainer pads for this)."""
    rep = POOLERS[pooling](
        forward(params, src_ids, src_mask, cfg, sp_mesh=sp_mesh), src_mask)

    dec_ids = tgt_ids[:, :-1]
    labels = tgt_ids[:, 1:]
    label_mask = tgt_mask[:, 1:].astype(jnp.float32)
    h = forward(params, dec_ids, jnp.ones_like(dec_ids), cfg,
                cond=rep, cond_params=tsdae_params, sp_mesh=sp_mesh)
    lg = logits(params, h, cfg).astype(jnp.float32)
    logp = jax.nn.log_softmax(lg, axis=-1)
    tok = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32),
                              axis=-1)[..., 0]
    return -jnp.sum(tok * label_mask) / jnp.maximum(jnp.sum(label_mask), 1.0)


class TSDAETrainer:
    """Minimal fit loop for TSDAE pretraining (the reference trains it through
    SentenceTransformer.fit with DenoisingAutoEncoderLoss; here the loss IS
    the step — AdamW over {model, tsdae} with optional BitFit masking)."""

    def __init__(self, params, cfg: DecoderConfig, tokenizer, *,
                 pooling: str = "weightedmean", max_seq_len: int = 75,
                 lr: float = 3e-5, weight_decay: float = 0.0,
                 freeze_nonbias: bool = False, seed: int = 0, sp_mesh=None):
        """sp_mesh: sequence-parallel long-document TSDAE — ring attention
        shards T over the mesh in the encoder AND the tied decoder (whose
        input is one token shorter, so the two sides pad independently)."""
        import optax

        from ..tokenization.specb import SpecbCodec
        from .bitfit import bitfit_mask

        self.cfg = cfg
        if pooling not in POOLERS:
            raise ValueError(f"unknown pooling {pooling!r}; "
                             f"choose from {sorted(POOLERS)}")
        self.pooling = pooling
        self.codec = SpecbCodec(tokenizer, max_seq_len=max_seq_len, specb=False,
                                clean_newlines=False)  # raw text, like ST
        self.max_seq_len = max_seq_len
        self.sp_mesh = sp_mesh
        self._src_pad = self._tgt_pad = max_seq_len
        if sp_mesh is not None:
            if "dp" not in sp_mesh.shape:
                raise ValueError("sp_mesh needs a 'dp' axis — ring attention "
                                 "shards the sequence over it")
            n_sp = sp_mesh.shape["dp"]
            up = lambda n: (n + n_sp - 1) // n_sp * n_sp
            self._src_pad = up(max_seq_len)          # encoder sees T
            self._tgt_pad = up(max_seq_len - 1) + 1  # decoder sees T-1
        self.tree = {"model": params,
                     "tsdae": init_tsdae_params(cfg, jax.random.key(seed))}
        # no weight decay on bias/LayerNorm leaves — the ST reference's
        # no-decay groups (SentenceTransformer.py:729-733), same mask as
        # ContrastiveTrainer._build_optimizer
        decay_mask = jax.tree_util.tree_map_with_path(
            lambda path, _: not any(
                getattr(p, "key", None) in ("bias", "bi", "bo", "bq", "bk",
                                            "bv", "b", "scale", "pos_weights")
                for p in path),
            self.tree)
        base = optax.adamw(lr, weight_decay=weight_decay, mask=decay_mask)
        if freeze_nonbias:
            mask = {"model": bitfit_mask(params),
                    "tsdae": jax.tree.map(lambda _: True, self.tree["tsdae"])}
            inv = jax.tree.map(lambda m: not m, mask)
            base = optax.chain(optax.masked(optax.set_to_zero(), inv), base,
                               optax.masked(optax.set_to_zero(), inv))
        self._opt = base
        self._opt_state = base.init(self.tree)

        # donate the OPT STATE (trainer-owned) so it aliases in place;
        # the params tree stays undonated — the caller owns those arrays
        @partial(jax.jit, donate_argnums=(1,))
        def step(tree, opt_state, src_ids, src_mask, tgt_ids, tgt_mask):
            def loss_fn(t):
                return tsdae_loss(t["model"], t["tsdae"], src_ids, src_mask,
                                  tgt_ids, tgt_mask, cfg, pooling,
                                  sp_mesh=sp_mesh)
            loss, grads = jax.value_and_grad(loss_fn)(tree)
            updates, opt_state = self._opt.update(grads, opt_state, tree)
            return optax.apply_updates(tree, updates), opt_state, loss

        self._step = step

    @property
    def params(self):
        return self.tree["model"]

    def train_batch(self, pairs) -> float:
        """pairs: [(noisy, original), ...] or InputExamples with 2 texts."""
        noisy = [p.texts[0] if hasattr(p, "texts") else p[0] for p in pairs]
        orig = [p.texts[1] if hasattr(p, "texts") else p[1] for p in pairs]
        src = self.codec.encode(noisy, is_query=False, pad_to=self._src_pad)
        tgt = self.codec.encode(orig, is_query=False, pad_to=self._tgt_pad)
        self.tree, self._opt_state, loss = self._step(
            self.tree, self._opt_state,
            jnp.asarray(src.input_ids), jnp.asarray(src.attention_mask),
            jnp.asarray(tgt.input_ids), jnp.asarray(tgt.attention_mask))
        return float(loss)

    def fit(self, batcher, epochs: int = 1, log_fn=None) -> list:
        """batcher: an iterable of batches, or a zero-arg callable returning
        one (like ContrastiveTrainer.fit). A one-shot iterator with epochs>1
        is materialized once — silently training only epoch 1 on an
        exhausted generator was a review finding."""
        if callable(batcher):
            make = batcher
        else:
            if epochs > 1 and iter(batcher) is batcher:
                batcher = list(batcher)
            make = lambda: batcher
        history = []
        step = 0
        for _ in range(epochs):
            for batch in make():
                loss = self.train_batch(batch)
                step += 1
                history.append({"step": step, "loss": loss})
                if log_fn:
                    log_fn(history[-1])
        return history
