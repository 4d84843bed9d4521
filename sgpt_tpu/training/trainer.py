"""Contrastive trainer — the TPU-native `SentenceTransformer.fit`.

Covers the reference training loop's feature set
(sentence_transformers/SentenceTransformer.py:616-844) with pjit-era mechanics:

  * MNRL loss over (anchor, positive[, hard-negative]) triplets, scale 20
  * BitFit (`--freezenonbias`) via masked optax updates (training/bitfit.py)
  * AdamW with bias/LayerNorm excluded from weight decay (:729-733)
  * warmup-linear schedule (:940-957), grad clipping (max_grad_norm)
  * gradient accumulation via optax.MultiSteps (:792-815)
  * GradCache chunked big-batch path (`--gradcache --chunksize`, training/gradcache.py)
  * evaluator-during-training + best-model tracking (:861-876)
  * step checkpointing with retention limit (:878-891), Orbax-based
  * one process, one mesh: batch sharded over dp, params optionally TP-sharded

The reference's DDP/Accelerate plumbing has no analog here — a jit'd train step
over a Mesh replaces all of it (SURVEY.md §2c).
"""
from __future__ import annotations

import dataclasses
import logging
import os
import time
from functools import partial
from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import mnrl_loss
from ..models.config import DecoderConfig
from ..models.decoder import forward
from ..ops.pooling import POOLERS, weighted_mean_pool
from ..tokenization.base import Tokenizer
from ..tokenization.specb import SpecbCodec
from .bitfit import bitfit_mask
from .gradcache import chunk_tree, gradcache_value_and_grad
from .schedules import make_schedule

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainConfig:
    lr: float = 2e-5                      # ST fit default (SentenceTransformer.py:625)
    weight_decay: float = 0.01
    epochs: int = 1
    batch_size: int = 64
    max_seq_len: int = 75                 # NLI default (training_nli_v2.py:64)
    scheduler: str = "warmuplinear"
    warmup_ratio: float = 0.1             # ST convention: 10% of steps
    max_grad_norm: float = 1.0
    grad_accum: int = 1
    scale: float = 20.0
    similarity: str = "cos_sim"
    pooling: str = "weightedmean"
    specb: bool = False
    freeze_nonbias: bool = False          # BitFit
    train_wte: bool = False
    use_gradcache: bool = False
    chunk_size: int = 8
    eval_steps: int = 0                   # 0 = only at epoch end
    checkpoint_steps: int = 0
    checkpoint_limit: int = 2
    output_dir: Optional[str] = None
    seed: int = 0
    # trainable dense heads (--addxlinear/--linearthenpool/--useact/--outfeats,
    # training_nli_v2.py:93-117): list of dicts with keys
    # in_features/out_features[/bias/activation/location]
    dense_heads: Optional[list] = None
    # optional metrics sink called with {'step', 'loss'|'eval_score', ...} —
    # plug wandb.log here (the reference's optional wandb integration,
    # SentenceTransformer.py:673-675,817-818)
    log_fn: Optional[Callable[[dict], None]] = None


class ContrastiveTrainer:
    def __init__(self, params, cfg: DecoderConfig, tokenizer: Tokenizer,
                 train_config: TrainConfig, mesh=None, sp_mesh=None):
        """mesh: optional jax.sharding.Mesh with ('dp','tp') axes. Batches are
        sharded over dp, params Megatron-TP-sharded over tp (parallel/sharding
        .py) — the single-controller replacement for the reference's 8-GPU
        Accelerate fit (SentenceTransformer.py:691-741). The computed loss and
        updates are EXACTLY the single-device ones: jit inserts the in-batch
        negatives all-gather from the sharding annotations.

        sp_mesh: SEQUENCE-parallel training — attention in every forward (and
        its backward; ring attention is differentiable through ppermute) runs
        as ring attention with T sharded over the mesh, so contrastive
        fine-tuning works at document lengths beyond one chip's attention
        budget. Mutually exclusive with mesh; max_seq_len must divide by the
        sp axis size. Long-context capability the reference lacks entirely
        (it truncates at 2048 — SURVEY §5)."""
        if mesh is not None and sp_mesh is not None:
            raise ValueError("pass either mesh (dp/tp training) or sp_mesh "
                             "(sequence-parallel long-context), not both")
        self.cfg = cfg
        self.tc = train_config
        self.sp_mesh = sp_mesh
        if sp_mesh is not None:
            if "dp" not in sp_mesh.shape:
                raise ValueError("sp_mesh needs a 'dp' axis — ring attention "
                                 "shards the sequence over it")
            n_sp = sp_mesh.shape["dp"]
            if train_config.max_seq_len % n_sp:
                raise ValueError(
                    f"max_seq_len={train_config.max_seq_len} must divide by "
                    f"the sp axis size {n_sp} (ring attention shards T)")
        self.tokenizer = tokenizer
        # clean_newlines=False: the reference's ST training path tokenizes
        # raw text; the newline->space cleanup is a BEIR-embed-path behavior
        self.codec = SpecbCodec(tokenizer, max_seq_len=train_config.max_seq_len,
                                specb=train_config.specb, clean_newlines=False)
        self.mesh = mesh
        self.params = params
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel import shard_params
            dp = mesh.shape["dp"]
            if train_config.use_gradcache and train_config.chunk_size % dp:
                raise ValueError(
                    f"gradcache chunk_size={train_config.chunk_size} must be "
                    f"divisible by dp={dp} (chunks shard over the dp axis)")
            self.params = shard_params(params, mesh)
            self._replicated = NamedSharding(mesh, P())
            self._batch_sharding = NamedSharding(mesh, P("dp", None))
            self._chunk_sharding = NamedSharding(mesh, P(None, "dp", None))
        self.best_score = -1e9
        self.best_params = None
        self.best_aux = None
        self._opt = None

        # auxiliary trainable params outside the decoder (stay trainable even
        # under BitFit, like the reference's pooling/Dense modules which are
        # never frozen — training_nli_v2.py freezes only the transformer)
        self.aux: dict = {}
        self._head_meta: list = []
        if train_config.pooling == "learned_weightedmean":
            # learnt per-position weights, init 1.0 (WeightedMeanPooling.py:19)
            self.aux["pos_weights"] = jnp.ones(
                (train_config.max_seq_len,), jnp.float32)
        if train_config.dense_heads:
            key = jax.random.key(train_config.seed + 1)
            heads = []
            for spec in train_config.dense_heads:
                key, sub = jax.random.split(key)
                h = {"w": 0.02 * jax.random.normal(
                    sub, (spec["in_features"], spec["out_features"]), jnp.float32)}
                if spec.get("bias", True):
                    h["b"] = jnp.zeros((spec["out_features"],), jnp.float32)
                heads.append(h)
                self._head_meta.append(
                    {"activation": spec.get("activation", "identity"),
                     "location": spec.get("location", "post_pool")})
            self.aux["heads"] = heads
        if mesh is not None and self.aux:
            self.aux = jax.tree.map(
                lambda x: jax.device_put(x, self._replicated), self.aux)

    # ------------------------------------------------------------------
    def _build_optimizer(self, total_steps: int):
        tc = self.tc
        # MultiSteps advances the inner schedule once per OPTIMIZER step, so
        # the horizon must be in optimizer steps, not micro-steps
        opt_steps = max(1, total_steps // max(tc.grad_accum, 1))
        schedule = make_schedule(tc.scheduler, tc.lr,
                                 int(tc.warmup_ratio * opt_steps), opt_steps)

        tree = {"model": self.params, "aux": self.aux}
        # no weight decay on bias/LayerNorm/position-weight leaves (ST :729-733)
        decay_mask = jax.tree_util.tree_map_with_path(
            lambda path, _: not any(
                getattr(p, "key", None) in ("bias", "bi", "bo", "bq", "bk", "bv",
                                            "b", "scale", "pos_weights")
                for p in path),
            tree)
        base = optax.chain(
            optax.clip_by_global_norm(tc.max_grad_norm),
            optax.adamw(schedule, weight_decay=tc.weight_decay, mask=decay_mask),
        )
        if tc.freeze_nonbias:
            mask = {"model": bitfit_mask(self.params, train_wte=tc.train_wte),
                    "aux": jax.tree.map(lambda _: True, self.aux)}
            inv = jax.tree.map(lambda m: not m, mask)
            # zero frozen grads BEFORE (clip norm sees only trainable grads) and
            # AFTER (adamw weight decay must not touch frozen leaves)
            base = optax.chain(optax.masked(optax.set_to_zero(), inv), base,
                               optax.masked(optax.set_to_zero(), inv))
        if tc.grad_accum > 1:
            base = optax.MultiSteps(base, every_k_schedule=tc.grad_accum)
        return base

    def _encode_fn(self):
        from ..encoder import _ACTIVATIONS
        from ..ops.pooling import learned_weighted_mean_pool

        cfg, method = self.cfg, self.tc.pooling
        learned = method == "learned_weightedmean"
        if not learned and method not in POOLERS:
            raise ValueError(
                f"pooling {method!r} not trainable here; choose one of "
                f"{sorted(POOLERS)} or 'learned_weightedmean'")
        pooler = POOLERS.get(method, weighted_mean_pool)
        head_meta = list(self._head_meta)
        sp_mesh = self.sp_mesh

        def encode(tree, chunk):
            h = forward(tree["model"], chunk["ids"], chunk["mask"], cfg,
                        sp_mesh=sp_mesh)
            heads = tree["aux"].get("heads", [])
            for p, meta in zip(heads, head_meta):
                if meta["location"] == "pre_pool":
                    h = h @ p["w"].astype(h.dtype)
                    if "b" in p:
                        h = h + p["b"].astype(h.dtype)
                    h = _ACTIVATIONS[meta["activation"]](h)
            if learned:
                emb = learned_weighted_mean_pool(h, chunk["mask"],
                                                 tree["aux"]["pos_weights"])
            else:
                emb = pooler(h, chunk["mask"])
            for p, meta in zip(heads, head_meta):
                if meta["location"] == "post_pool":
                    emb = emb @ p["w"].astype(emb.dtype)
                    if "b" in p:
                        emb = emb + p["b"].astype(emb.dtype)
                    emb = _ACTIVATIONS[meta["activation"]](emb)
            return emb

        return encode

    def _build_step(self):
        tc = self.tc
        encode = self._encode_fn()
        loss_fn = partial(mnrl_loss, scale=tc.scale, similarity=tc.similarity)

        if tc.use_gradcache:
            vg = gradcache_value_and_grad(
                encode, lambda a, p, n=None: (loss_fn(a, p) if n is None
                                              else loss_fn(a, p, n)))

            @partial(jax.jit, donate_argnums=(1,))
            def step(tree, opt_state, *towers):
                loss, grads = vg(tree, *towers)
                updates, opt_state = self._opt.update(grads, opt_state, tree)
                return optax.apply_updates(tree, updates), opt_state, loss
        else:
            def direct_loss(tree, towers):
                reps = [encode(tree, t) for t in towers]
                return loss_fn(*reps)

            # donate the OPT STATE (trainer-owned; Adam m/v = 2x params
            # in fp32 — the dominant buffer) so it aliases in place.
            # The params tree is NOT donated: the caller still owns the
            # arrays passed to the constructor and step 1 would delete
            # them under their feet (broke the sp equality tests).
            @partial(jax.jit, donate_argnums=(1,))
            def step(tree, opt_state, *towers):
                loss, grads = jax.value_and_grad(direct_loss)(tree, list(towers))
                updates, opt_state = self._opt.update(grads, opt_state, tree)
                return optax.apply_updates(tree, updates), opt_state, loss

        return step

    # ------------------------------------------------------------------
    def _tokenize_tower(self, texts: Sequence[str], is_query: bool):
        enc = self.codec.encode(list(texts), is_query=is_query,
                                pad_to=self.tc.max_seq_len)
        return {"ids": np.asarray(enc.input_ids),
                "mask": np.asarray(enc.attention_mask)}

    def _prep_batch(self, batch: Sequence[Tuple[str, ...]]):
        """batch of (anchor, positive[, negative]) → tower dicts.

        Returns None for a ragged tail batch too small to keep: static shapes
        are the TPU contract, so tails are trimmed to the dp/chunk granularity
        (the reference's DataLoader drop_last analog)."""
        batch = list(batch)
        granularity = 1
        if self.tc.use_gradcache:
            granularity = self.tc.chunk_size
        if self.mesh is not None:
            granularity = max(granularity, self.mesh.shape["dp"])
        keep = len(batch) - len(batch) % granularity
        if keep != len(batch):
            logger.warning("trimming ragged tail batch %d -> %d "
                           "(granularity %d)", len(batch), keep, granularity)
            if keep == 0:
                return None
            batch = batch[:keep]
        cols = list(zip(*batch))
        towers = [self._tokenize_tower(cols[0], is_query=True)]
        for c in cols[1:]:
            towers.append(self._tokenize_tower(c, is_query=False))
        if self.tc.use_gradcache:
            towers = [chunk_tree(t, self.tc.chunk_size) for t in towers]
        if self.mesh is not None:
            sh = (self._chunk_sharding if self.tc.use_gradcache
                  else self._batch_sharding)
            # device_put on the HOST array does the sharded transfer in
            # one hop (jnp.asarray first landed it on the default device)
            towers = [jax.tree.map(
                lambda x: jax.device_put(np.asarray(x), sh), t)
                for t in towers]
        else:
            towers = [jax.tree.map(jnp.asarray, t) for t in towers]
        return towers

    # ------------------------------------------------------------------
    def fit(self, train_batches: Callable[[], Iterable[Sequence[Tuple[str, ...]]]],
            steps_per_epoch: int,
            evaluator: Optional[Callable] = None) -> dict:
        """train_batches(): fresh iterator of batches each epoch.

        evaluator(params) -> float; higher is better (ST convention). An
        evaluator taking TWO positional args receives (params, aux) so it can
        apply trained dense heads / learnt position weights — otherwise
        best-model selection scores a model without them.
        Returns {'params', 'best_params', 'best_score', 'history'}.
        """
        tc = self.tc
        total = steps_per_epoch * tc.epochs
        self._opt = self._build_optimizer(total)
        tree = {"model": self.params, "aux": self.aux}
        opt_state = self._opt.init(tree)
        step_fn = self._build_step()

        history: List[dict] = []
        gstep = 0
        last_eval_step = -1
        for epoch in range(tc.epochs):
            t0 = time.time()
            for batch in train_batches():
                towers = self._prep_batch(batch)
                if towers is None:  # ragged tail smaller than the granularity
                    continue
                tree, opt_state, loss = step_fn(tree, opt_state, *towers)
                self.params, self.aux = tree["model"], tree["aux"]
                gstep += 1
                if gstep % max(1, steps_per_epoch // 10) == 0:
                    logger.info("epoch %d step %d loss %.4f", epoch, gstep, float(loss))
                # keep the device scalar: float() here would sync the host every
                # micro-step; history is materialized once at the end
                record = {"step": gstep, "loss": loss}
                history.append(record)
                if tc.log_fn:
                    tc.log_fn({"step": gstep, "loss": float(loss)})
                if evaluator and tc.eval_steps and gstep % tc.eval_steps == 0:
                    self._evaluate(evaluator, gstep, history)
                    last_eval_step = gstep
                if tc.checkpoint_steps and gstep % tc.checkpoint_steps == 0:
                    self.save_checkpoint(gstep, opt_state)
            if evaluator and gstep != last_eval_step:  # skip back-to-back dup
                self._evaluate(evaluator, gstep, history)
                last_eval_step = gstep
            logger.info("epoch %d done in %.1fs", epoch, time.time() - t0)

        history = [{**h, "loss": float(h["loss"])} if "loss" in h else h
                   for h in history]
        return {"params": self.params, "aux": self.aux,
                "best_params": self.best_params or self.params,
                "best_aux": self.best_aux or self.aux,  # paired snapshot
                "best_score": self.best_score, "history": history}

    def export_model(self, tokenizer_name: Optional[str] = None):
        """Package trained weights as an SGPTModel (dense heads + learnt mean)."""
        from ..model import SGPTModel
        dense_heads = None
        if self._head_meta:
            dense_heads = [{**w, **m} for w, m in
                           zip(self.aux.get("heads", []), self._head_meta)]
        return SGPTModel(
            self.params, self.cfg, self.tokenizer,
            method=("learned_weightedmean"
                    if "pos_weights" in self.aux else self.tc.pooling),
            specb=self.tc.specb, max_seq_len=self.tc.max_seq_len,
            dense_heads=dense_heads,
            learned_weights=self.aux.get("pos_weights"),
            tokenizer_name=tokenizer_name)

    def _evaluate(self, evaluator, step, history):
        import inspect
        try:
            n_args = len([p for p in inspect.signature(evaluator).parameters
                          .values() if p.default is inspect.Parameter.empty
                          and p.kind in (p.POSITIONAL_ONLY,
                                         p.POSITIONAL_OR_KEYWORD)])
        except (TypeError, ValueError):
            n_args = 1
        score = float(evaluator(self.params, self.aux) if n_args >= 2
                      else evaluator(self.params))
        record = {"step": step, "eval_score": score}
        history.append(record)
        if self.tc.log_fn:
            self.tc.log_fn(record)
        logger.info("eval @%d: %.4f", step, score)
        if score > self.best_score:  # best-model save (ST fit :861-876)
            self.best_score = score
            self.best_params = jax.tree.map(lambda x: x, self.params)
            self.best_aux = jax.tree.map(lambda x: x, self.aux)
            if self.tc.output_dir:
                self.save_model(os.path.join(self.tc.output_dir, "best"))

    # ------------------------------------------------------------------
    def save_checkpoint(self, step: int, opt_state=None):
        """Step checkpoint with retention pruning (ST fit :878-891)."""
        if not self.tc.output_dir:
            return
        from .checkpoint import save_checkpoint as _save, prune_checkpoints
        path = os.path.join(self.tc.output_dir, "checkpoints", str(step))
        _save(path, {"model": self.params, "aux": self.aux},
              opt_state=opt_state, step=step)
        prune_checkpoints(os.path.join(self.tc.output_dir, "checkpoints"),
                          self.tc.checkpoint_limit)

    def save_model(self, path: str):
        from .checkpoint import save_checkpoint as _save
        _save(path, {"model": self.params, "aux": self.aux}, step=None)

    def restore(self, path: str):
        """Resume weights from a step checkpoint or saved model dir.

        (The reference never resumes optimizer state — fresh fit each run,
        SURVEY.md §5; we restore weights the same way. Optimizer state is in
        the checkpoint for forensic use.)
        """
        from .checkpoint import load_checkpoint
        tree = load_checkpoint(path, like_params={"model": self.params,
                                                  "aux": self.aux})
        self.params = jax.tree.map(jnp.asarray, tree["model"])
        self.aux = jax.tree.map(jnp.asarray, tree.get("aux", self.aux))
        if self.mesh is not None:
            # re-apply the construction-time layout: restore() otherwise
            # materializes the full tree unsharded on one device — an OOM at
            # TP-sharded 6B scale, and a silent layout change below it
            from ..parallel import shard_params
            self.params = shard_params(self.params, self.mesh)
            self.aux = jax.tree.map(
                lambda x: jax.device_put(x, self._replicated), self.aux)
        return self
