"""Trainable cross-encoder (classification/regression head over a pair encoding).

Parity target: the ST fork's `cross_encoder/CrossEncoder.py` (~500 LoC upstream
surface, SURVEY.md §2b) — a transformer scoring concatenated (sentence1,
sentence2) pairs through a classification head, trained with cross-entropy
(num_labels > 1) or MSE/logistic regression (num_labels == 1). The SGPT paper's
CE is zero-shot (crossencoder.py); this class covers the *trainable* API so ST
users migrating find the full surface.

TPU-first shape: pairs tokenize as [s1; EOS; s2], pooled by last-token, one
jit'd train step, optax AdamW + warmup-linear.
"""
from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .models.config import DecoderConfig
from .models.decoder import forward
from .ops.pooling import last_token_pool
from .tokenization.base import Tokenizer
from .tokenization.specb import DEFAULT_BUCKETS, pick_bucket
from .training.schedules import make_schedule

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("cfg",))
def _pair_logits(params, head_w, head_b, ids, mask, cfg: DecoderConfig):
    h = forward(params, ids, mask, cfg)
    rep = last_token_pool(h, mask)
    return rep.astype(jnp.float32) @ head_w + head_b


class CrossEncoderTrainable:
    def __init__(self, params, cfg: DecoderConfig, tokenizer: Tokenizer, *,
                 num_labels: int = 1, max_length: Optional[int] = None,
                 batch_size: int = 16, seed: int = 0):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.num_labels = num_labels
        self.max_length = max_length or cfg.max_position_embeddings
        self.batch_size = batch_size
        key = jax.random.key(seed)
        self.head_w = (0.02 * jax.random.normal(
            key, (cfg.hidden_size, num_labels))).astype(jnp.float32)
        self.head_b = jnp.zeros((num_labels,), jnp.float32)

    # ------------------------------------------------------------------
    def _tokenize_pairs(self, pairs: Sequence[Tuple[str, str]], pad_to=None):
        rows = []
        budget = self.max_length - 1  # one slot for the EOS separator
        for s1, s2 in pairs:
            ids1 = self.tokenizer.encode(s1)
            ids2 = self.tokenizer.encode(s2)
            # longest_first truncation like the ST CrossEncoder's tokenizer
            # call: iteratively trim the longer member, so BOTH sides survive
            # (right-truncation dropped s2 entirely when s1 filled the window;
            # left-truncation dropped s1 — either makes scores one-sided)
            a, b = len(ids1), len(ids2)
            if a + b > budget:
                # closed form of the trim-the-longer pop loop (ties pop s2):
                # the shorter side survives whole; if both exceed half the
                # budget they meet at ceil/floor of budget/2
                a = min(a, max((budget + 1) // 2, budget - b))
                b = budget - a
            rows.append(ids1[:a] + [self.tokenizer.eos_id] + ids2[:b])
        maxlen = max(len(r) for r in rows)
        T = pad_to or max(pick_bucket(maxlen, DEFAULT_BUCKETS, self.max_length),
                          maxlen)
        B = len(rows)
        ids = np.full((B, T), self.tokenizer.pad_id, np.int32)
        mask = np.zeros((B, T), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return jnp.asarray(ids), jnp.asarray(mask)

    def predict(self, pairs: Sequence[Tuple[str, str]],
                apply_softmax: bool = False, **kw) -> np.ndarray:
        """num_labels==1 → sigmoid scores (ST convention); else logits/probs."""
        if len(pairs) == 0:
            shape = (0,) if self.num_labels == 1 else (0, self.num_labels)
            return np.zeros(shape, np.float64)
        out = []
        B = self.batch_size
        for s in range(0, len(pairs), B):
            chunk = list(pairs[s : s + B])
            pad = B - len(chunk)
            chunk_padded = chunk + [("", "")] * pad
            ids, mask = self._tokenize_pairs(chunk_padded)
            logits = _pair_logits(self.params, self.head_w, self.head_b,
                                  ids, mask, self.cfg)
            logits = np.asarray(logits[: len(chunk)], np.float64)
            out.append(logits)
        logits = np.concatenate(out, axis=0)
        if self.num_labels == 1:
            return 1.0 / (1.0 + np.exp(-logits[:, 0]))
        if apply_softmax:
            e = np.exp(logits - logits.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)
        return logits

    # ------------------------------------------------------------------
    def fit(self, train_samples: Sequence, *, epochs: int = 1, lr: float = 2e-5,
            warmup_ratio: float = 0.1, evaluator: Optional[Callable] = None,
            shuffle_seed: int = 0) -> List[dict]:
        """train_samples: InputExample-likes with .texts=(s1, s2) and .label."""
        # ceil: the loop runs ceil(len/B) steps per epoch — a floor here
        # clamped warmuplinear to lr=0 for every trailing partial-batch step
        tc_steps = max(1, -(-len(train_samples) // self.batch_size)) * epochs
        schedule = make_schedule("warmuplinear", lr,
                                 int(warmup_ratio * tc_steps), tc_steps)
        opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(schedule))
        trainable = {"params": self.params, "w": self.head_w, "b": self.head_b}
        opt_state = opt.init(trainable)
        num_labels, cfg = self.num_labels, self.cfg

        def loss_fn(tree, ids, mask, labels):
            logits = _pair_logits(tree["params"], tree["w"], tree["b"],
                                  ids, mask, cfg)
            if num_labels == 1:
                return jnp.mean(optax.sigmoid_binary_cross_entropy(
                    logits[:, 0], labels.astype(jnp.float32)))
            return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
                logits, labels.astype(jnp.int32)))

        @jax.jit
        def step(tree, opt_state, ids, mask, labels):
            loss, grads = jax.value_and_grad(loss_fn)(tree, ids, mask, labels)
            updates, opt_state = opt.update(grads, opt_state, tree)
            return optax.apply_updates(tree, updates), opt_state, loss

        rng = np.random.default_rng(shuffle_seed)
        history = []
        samples = list(train_samples)
        B = self.batch_size
        for epoch in range(epochs):
            rng.shuffle(samples)
            for s in range(0, len(samples), B):
                batch = samples[s : s + B]
                if len(batch) < B:  # partial batch: pad with repeats (static shapes)
                    batch = batch + samples[: B - len(batch)]
                ids, mask = self._tokenize_pairs(
                    [tuple(ex.texts[:2]) for ex in batch],
                    pad_to=self.max_length)
                labels = jnp.asarray([ex.label for ex in batch])
                trainable, opt_state, loss = step(trainable, opt_state,
                                                  ids, mask, labels)
                history.append({"epoch": epoch, "loss": float(loss)})
            self.params, self.head_w, self.head_b = (
                trainable["params"], trainable["w"], trainable["b"])
            if evaluator:
                score = float(evaluator(self))
                history.append({"epoch": epoch, "eval_score": score})
                logger.info("epoch %d eval %.4f", epoch, score)
        return history


class CECorrelationEvaluator:
    """Spearman between predicted pair scores and gold (ST CECorrelationEvaluator)."""

    def __init__(self, pairs: Sequence[Tuple[str, str]], scores: Sequence[float]):
        self.pairs, self.gold = list(pairs), list(scores)

    def __call__(self, model: CrossEncoderTrainable) -> float:
        from .evaluation.metrics import spearman
        pred = model.predict(self.pairs)
        pred = pred if pred.ndim == 1 else pred[:, -1]
        return spearman(pred.tolist(), self.gold)


class CEBinaryClassificationEvaluator:
    """Best-threshold accuracy over predicted scores — the ST fork's
    CEBinaryClassificationEvaluator ("determines automatically the optimal
    threshold"); the fixed-threshold variant is CEBinaryAccuracyEvaluator."""

    def __init__(self, pairs: Sequence[Tuple[str, str]], labels: Sequence[int]):
        self.pairs, self.labels = list(pairs), np.asarray(labels, int)

    def __call__(self, model: CrossEncoderTrainable) -> float:
        pred = model.predict(self.pairs)
        pred = pred if pred.ndim == 1 else pred[:, -1]
        best = 0.0
        # include a threshold above max(pred): the all-negative classification
        thresholds = np.concatenate([np.unique(pred), [pred.max() + 1.0]])
        for t in thresholds:
            best = max(best, float(np.mean((pred >= t).astype(int) == self.labels)))
        return best


class CEBinaryAccuracyEvaluator:
    """Fixed-threshold accuracy for 1-output cross-encoders — the ST fork's
    cross_encoder/evaluation/CEBinaryAccuracyEvaluator.py (predict > threshold
    vs gold labels; default 0.5 on the sigmoid scores)."""

    def __init__(self, pairs: Sequence[Tuple[str, str]], labels: Sequence[int],
                 threshold: float = 0.5):
        self.pairs, self.labels = list(pairs), np.asarray(labels, int)
        self.threshold = threshold

    def __call__(self, model: CrossEncoderTrainable) -> float:
        pred = model.predict(self.pairs)
        pred = pred if pred.ndim == 1 else pred[:, -1]
        return float(np.mean((pred > self.threshold).astype(int) == self.labels))


class CESoftmaxAccuracyEvaluator:
    """Argmax accuracy for multi-output cross-encoders — the ST fork's
    cross_encoder/evaluation/CESoftmaxAccuracyEvaluator.py."""

    def __init__(self, pairs: Sequence[Tuple[str, str]], labels: Sequence[int]):
        self.pairs, self.labels = list(pairs), np.asarray(labels, int)

    def __call__(self, model: CrossEncoderTrainable) -> float:
        logits = model.predict(self.pairs)
        if logits.ndim != 2:
            raise ValueError("CESoftmaxAccuracyEvaluator needs a multi-output "
                             "model (num_labels >= 2)")
        return float(np.mean(np.argmax(logits, axis=1) == self.labels))


class CERerankingEvaluator:
    """Mean MRR@k over rerank samples — the ST fork's
    cross_encoder/evaluation/CERerankingEvaluator.py. Each sample is
    {'query': str, 'positive': [docs], 'negative': [docs]}; samples missing
    either side are skipped (reference behavior). All (query, doc) pairs
    across samples score in ONE predict pass (one length-bucketed device
    sweep) instead of the reference's per-query dispatch."""

    def __init__(self, samples, mrr_at_k: int = 10):
        if isinstance(samples, dict):
            samples = list(samples.values())
        self.samples = [s for s in samples if s["positive"] and s["negative"]]
        self.mrr_at_k = mrr_at_k

    def __call__(self, model) -> float:
        if not self.samples:
            return 0.0
        pairs, spans = [], []
        for s in self.samples:
            docs = list(s["positive"]) + list(s["negative"])
            spans.append((len(pairs), len(pairs) + len(docs), len(s["positive"])))
            pairs.extend((s["query"], d) for d in docs)
        pred = model.predict(pairs)
        pred = pred if pred.ndim == 1 else pred[:, -1]
        mrrs = []
        for lo, hi, n_pos in spans:
            order = np.argsort(-pred[lo:hi], kind="stable")
            mrr = 0.0
            for rank, idx in enumerate(order[: self.mrr_at_k]):
                if idx < n_pos:
                    mrr = 1.0 / (rank + 1)
                    break
            mrrs.append(mrr)
        return float(np.mean(mrrs))
