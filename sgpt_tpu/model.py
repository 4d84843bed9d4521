"""SGPTModel — the user-facing model pipeline with persistence.

Plays the role of the reference's `SentenceTransformer(modules=[...])` pipeline
(Transformer → [Dense…] → Pooling → [Dense…]) and its `modules.json` save format
(SentenceTransformer.py:390-434,903-936), re-designed as data + pure functions:
a manifest.json describing the pipeline and one checkpoint holding every
trainable leaf (decoder params, dense heads, learnt position weights).

`AsymModel` is the dual-tower `models.Asym` equivalent
(sentence_transformers/models/Asym.py:10-122; wired for BEIR by
biencoder/beir/custommodels/sentence_bert_asym.py): queries and documents route
to different towers, never mixed in one batch.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .encoder import EmbeddingEngine
from .models.config import DecoderConfig
from .tokenization.base import Tokenizer, get_tokenizer
from .training.checkpoint import load_checkpoint, save_checkpoint

MANIFEST = "manifest.json"


@dataclasses.dataclass
class SGPTModel:
    params: dict
    cfg: DecoderConfig
    tokenizer: Tokenizer
    method: str = "weightedmean"
    specb: bool = False
    layeridx: int = -1
    normalize: bool = False
    max_seq_len: Optional[int] = None
    dense_heads: Optional[List[dict]] = None      # application order
    learned_weights: Optional[jax.Array] = None
    tokenizer_name: Optional[str] = None
    batch_size: int = 32

    def engine(self, **overrides) -> EmbeddingEngine:
        kw = dict(method=self.method, specb=self.specb, layeridx=self.layeridx,
                  normalize_embeddings=self.normalize, max_seq_len=self.max_seq_len,
                  dense_heads=self.dense_heads,
                  learned_weights=self.learned_weights,
                  batch_size=self.batch_size)
        kw.update(overrides)
        return EmbeddingEngine(self.params, self.cfg, self.tokenizer, **kw)

    def encode(self, texts: Sequence[str], is_query: bool = False, **kw) -> np.ndarray:
        return self.engine().encode(list(texts), is_query=is_query, **kw)

    def encode_queries(self, queries, **kw):
        return self.engine().encode_queries(queries, **kw)

    def encode_corpus(self, corpus, **kw):
        return self.engine().encode_corpus(corpus, **kw)

    # ------------------------------------------------------------------
    def save(self, path: str):
        os.makedirs(path, exist_ok=True)
        manifest = {
            "format": "sgpt_tpu.v1",
            # dtype serializes by canonical name so a bf16 model reloads as
            # bf16 (dropping it silently reloaded as float32: different
            # numerics, ~2x the HBM/compute — review finding)
            "cfg": {**{k: v for k, v in dataclasses.asdict(self.cfg).items()
                       if k != "dtype"},
                    "dtype": jnp.dtype(self.cfg.dtype).name},
            "method": self.method,
            "specb": self.specb,
            "layeridx": self.layeridx,
            "normalize": self.normalize,
            "max_seq_len": self.max_seq_len,
            "tokenizer_name": self.tokenizer_name,
            "batch_size": self.batch_size,
            "dense_heads": [
                {"activation": h.get("activation", "identity"),
                 "location": h.get("location", "post_pool"),
                 "bias": h.get("b") is not None}
                for h in self.dense_heads or []],
            "has_learned_weights": self.learned_weights is not None,
        }
        with open(os.path.join(path, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)
        tree = {"decoder": self.params}
        if self.dense_heads:
            tree["heads"] = [
                {k: v for k, v in h.items() if k in ("w", "b") and v is not None}
                for h in self.dense_heads]
        if self.learned_weights is not None:
            tree["learned_weights"] = self.learned_weights
        save_checkpoint(os.path.join(path, "weights"), tree)

    @classmethod
    def load(cls, path: str, tokenizer: Optional[Tokenizer] = None) -> "SGPTModel":
        with open(os.path.join(path, MANIFEST)) as f:
            manifest = json.load(f)
        cfg_dict = dict(manifest["cfg"])
        if "dtype" in cfg_dict:
            # canonical jnp types for the common three; jnp.dtype(name) keeps
            # every other dtype loadable instead of KeyError-ing
            cfg_dict["dtype"] = {"float32": jnp.float32,
                                 "bfloat16": jnp.bfloat16,
                                 "float16": jnp.float16}.get(
                cfg_dict["dtype"]) or jnp.dtype(cfg_dict["dtype"])
        cfg = DecoderConfig(**cfg_dict)

        tree = load_checkpoint(os.path.join(path, "weights"))
        params = tree["decoder"]
        heads_meta = manifest.get("dense_heads", [])
        dense_heads = None
        if heads_meta:
            dense_heads = []
            for meta, weights in zip(heads_meta, tree["heads"]):
                h = {"w": jnp.asarray(weights["w"]),
                     "activation": meta["activation"],
                     "location": meta["location"]}
                if meta["bias"]:
                    h["b"] = jnp.asarray(weights["b"])
                dense_heads.append(h)
        lw = (jnp.asarray(tree["learned_weights"])
              if manifest.get("has_learned_weights") else None)
        tokenizer = tokenizer or get_tokenizer(manifest.get("tokenizer_name"))
        return cls(params=jax.tree.map(jnp.asarray, params), cfg=cfg,
                   tokenizer=tokenizer, method=manifest["method"],
                   specb=manifest["specb"], layeridx=manifest["layeridx"],
                   normalize=manifest["normalize"],
                   max_seq_len=manifest["max_seq_len"],
                   dense_heads=dense_heads, learned_weights=lw,
                   tokenizer_name=manifest.get("tokenizer_name"),
                   batch_size=manifest.get("batch_size", 32))


@dataclasses.dataclass
class AsymModel:
    """Key-routed dual-tower model: separate towers for queries and documents.

    The reference builds this as Asym({'QRY': [...], 'DOCPOS': [...]}) with the
    doc tower shared for positives and negatives (train_bi-encoder_mnrl.py asym
    branch; serving adapter SentenceBERTAsym, sentence_bert_asym.py:8-33).
    """
    query_model: SGPTModel
    doc_model: SGPTModel

    def encode(self, texts: Sequence[str], is_query: bool = False, **kw):
        model = self.query_model if is_query else self.doc_model
        return model.encode(texts, is_query=is_query, **kw)

    def encode_queries(self, queries, **kw):
        return self.query_model.encode_queries(queries, **kw)

    def encode_corpus(self, corpus, **kw):
        return self.doc_model.encode_corpus(corpus, **kw)

    def save(self, path: str):
        self.query_model.save(os.path.join(path, "query"))
        self.doc_model.save(os.path.join(path, "doc"))
        with open(os.path.join(path, MANIFEST), "w") as f:
            json.dump({"format": "sgpt_tpu.asym.v1"}, f)

    @classmethod
    def load(cls, path: str, tokenizer: Optional[Tokenizer] = None) -> "AsymModel":
        return cls(SGPTModel.load(os.path.join(path, "query"), tokenizer),
                   SGPTModel.load(os.path.join(path, "doc"), tokenizer))
