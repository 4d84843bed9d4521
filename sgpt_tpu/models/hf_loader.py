"""Import HuggingFace checkpoints into the stacked-pytree layout.

The converter works from a plain name→numpy mapping so torch is only an optional
dependency (state dicts from `model.state_dict()` or safetensors both work).
Name maps cover the three families the SGPT reference evaluates
(ref: biencoder/beir/beir_dense_retriever.py:123 loads via AutoModel;
crossencoder/beir/sgptce.py:54 via AutoModelForCausalLM).
"""
from __future__ import annotations

import re
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from .config import DecoderConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _strip_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Drop 'transformer.' / 'gpt_neox.' style prefixes and lm_head into flat names."""
    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(transformer\.|model\.|bert\.)", "", k)
        out[k] = v
    return out


def _stack(per_layer):
    return jnp.asarray(np.stack(per_layer, axis=0))


def convert_hf_state_dict(state_dict: Mapping, cfg: DecoderConfig, family: str,
                          dtype=jnp.float32) -> dict:
    """family: 'neo' | 'gptj' | 'bloom'. Returns the decoder params pytree."""
    sd = {k: _np(v) for k, v in _strip_prefix(state_dict).items()}
    L = cfg.num_layers
    H, Dh, D = cfg.num_heads, cfg.head_size, cfg.hidden_size

    def t(name):  # torch [out,in] → ours [in,out]
        return sd[name].T

    if family == "neo":
        attn_p = "h.{i}.attn.attention."
        params = {
            "wte": jnp.asarray(sd["wte.weight"], dtype),
            "wpe": jnp.asarray(sd["wpe.weight"], dtype),
            "layers": {
                "ln1": {"scale": _stack([sd[f"h.{i}.ln_1.weight"] for i in range(L)]),
                        "bias": _stack([sd[f"h.{i}.ln_1.bias"] for i in range(L)])},
                "attn": {
                    "wq": _stack([t(attn_p.format(i=i) + "q_proj.weight") for i in range(L)]),
                    "wk": _stack([t(attn_p.format(i=i) + "k_proj.weight") for i in range(L)]),
                    "wv": _stack([t(attn_p.format(i=i) + "v_proj.weight") for i in range(L)]),
                    "wo": _stack([t(attn_p.format(i=i) + "out_proj.weight") for i in range(L)]),
                    "bo": _stack([sd[attn_p.format(i=i) + "out_proj.bias"] for i in range(L)]),
                },
                "ln2": {"scale": _stack([sd[f"h.{i}.ln_2.weight"] for i in range(L)]),
                        "bias": _stack([sd[f"h.{i}.ln_2.bias"] for i in range(L)])},
                "mlp": {
                    "wi": _stack([t(f"h.{i}.mlp.c_fc.weight") for i in range(L)]),
                    "bi": _stack([sd[f"h.{i}.mlp.c_fc.bias"] for i in range(L)]),
                    "wo": _stack([t(f"h.{i}.mlp.c_proj.weight") for i in range(L)]),
                    "bo": _stack([sd[f"h.{i}.mlp.c_proj.bias"] for i in range(L)]),
                },
            },
            "ln_f": {"scale": jnp.asarray(sd["ln_f.weight"], dtype),
                     "bias": jnp.asarray(sd["ln_f.bias"], dtype)},
        }

    elif family == "gptj":
        params = {
            "wte": jnp.asarray(sd["wte.weight"], dtype),
            "layers": {
                "ln1": {"scale": _stack([sd[f"h.{i}.ln_1.weight"] for i in range(L)]),
                        "bias": _stack([sd[f"h.{i}.ln_1.bias"] for i in range(L)])},
                "attn": {
                    "wq": _stack([t(f"h.{i}.attn.q_proj.weight") for i in range(L)]),
                    "wk": _stack([t(f"h.{i}.attn.k_proj.weight") for i in range(L)]),
                    "wv": _stack([t(f"h.{i}.attn.v_proj.weight") for i in range(L)]),
                    "wo": _stack([t(f"h.{i}.attn.out_proj.weight") for i in range(L)]),
                },
                "mlp": {
                    "wi": _stack([t(f"h.{i}.mlp.fc_in.weight") for i in range(L)]),
                    "bi": _stack([sd[f"h.{i}.mlp.fc_in.bias"] for i in range(L)]),
                    "wo": _stack([t(f"h.{i}.mlp.fc_out.weight") for i in range(L)]),
                    "bo": _stack([sd[f"h.{i}.mlp.fc_out.bias"] for i in range(L)]),
                },
            },
            "ln_f": {"scale": jnp.asarray(sd["ln_f.weight"], dtype),
                     "bias": jnp.asarray(sd["ln_f.bias"], dtype)},
        }

    elif family == "bloom":
        # BLOOM fuses QKV head-major: weight (3*D, D) viewed as (H, 3, Dh, D).
        wq, wk, wv, bq, bk, bv, wo, bo = [], [], [], [], [], [], [], []
        for i in range(L):
            w = sd[f"h.{i}.self_attention.query_key_value.weight"].reshape(H, 3, Dh, D)
            b = sd[f"h.{i}.self_attention.query_key_value.bias"].reshape(H, 3, Dh)
            # ours: (D_in, H*Dh) with head-major concatenation of the out axis
            wq.append(w[:, 0].reshape(H * Dh, D).T)
            wk.append(w[:, 1].reshape(H * Dh, D).T)
            wv.append(w[:, 2].reshape(H * Dh, D).T)
            bq.append(b[:, 0].reshape(H * Dh))
            bk.append(b[:, 1].reshape(H * Dh))
            bv.append(b[:, 2].reshape(H * Dh))
            wo.append(sd[f"h.{i}.self_attention.dense.weight"].T)
            bo.append(sd[f"h.{i}.self_attention.dense.bias"])
        params = {
            "wte": jnp.asarray(sd["word_embeddings.weight"], dtype),
            "emb_ln": {"scale": jnp.asarray(sd["word_embeddings_layernorm.weight"], dtype),
                       "bias": jnp.asarray(sd["word_embeddings_layernorm.bias"], dtype)},
            "layers": {
                "ln1": {"scale": _stack([sd[f"h.{i}.input_layernorm.weight"] for i in range(L)]),
                        "bias": _stack([sd[f"h.{i}.input_layernorm.bias"] for i in range(L)])},
                "attn": {"wq": _stack(wq), "wk": _stack(wk), "wv": _stack(wv),
                         "bq": _stack(bq), "bk": _stack(bk), "bv": _stack(bv),
                         "wo": _stack(wo), "bo": _stack(bo)},
                "ln2": {"scale": _stack([sd[f"h.{i}.post_attention_layernorm.weight"] for i in range(L)]),
                        "bias": _stack([sd[f"h.{i}.post_attention_layernorm.bias"] for i in range(L)])},
                "mlp": {
                    "wi": _stack([t(f"h.{i}.mlp.dense_h_to_4h.weight") for i in range(L)]),
                    "bi": _stack([sd[f"h.{i}.mlp.dense_h_to_4h.bias"] for i in range(L)]),
                    "wo": _stack([t(f"h.{i}.mlp.dense_4h_to_h.weight") for i in range(L)]),
                    "bo": _stack([sd[f"h.{i}.mlp.dense_4h_to_h.bias"] for i in range(L)]),
                },
            },
            "ln_f": {"scale": jnp.asarray(sd["ln_f.weight"], dtype),
                     "bias": jnp.asarray(sd["ln_f.bias"], dtype)},
        }
    elif family == "bert":
        # HF BertModel: embeddings.{word,position,token_type}_embeddings +
        # LayerNorm; encoder.layer.i.attention.self.{query,key,value},
        # attention.output.{dense,LayerNorm}, intermediate.dense,
        # output.{dense,LayerNorm}. The pooler head is ignored (the ST
        # pipeline pools hidden states itself — models/Pooling.py).
        lp = "encoder.layer.{i}."
        params = {
            "wte": jnp.asarray(sd["embeddings.word_embeddings.weight"], dtype),
            "wpe": jnp.asarray(sd["embeddings.position_embeddings.weight"], dtype),
            "wtt": jnp.asarray(sd["embeddings.token_type_embeddings.weight"], dtype),
            "emb_ln": {"scale": jnp.asarray(sd["embeddings.LayerNorm.weight"], dtype),
                       "bias": jnp.asarray(sd["embeddings.LayerNorm.bias"], dtype)},
            "layers": {
                "attn": {
                    "wq": _stack([t(lp.format(i=i) + "attention.self.query.weight") for i in range(L)]),
                    "bq": _stack([sd[lp.format(i=i) + "attention.self.query.bias"] for i in range(L)]),
                    "wk": _stack([t(lp.format(i=i) + "attention.self.key.weight") for i in range(L)]),
                    "bk": _stack([sd[lp.format(i=i) + "attention.self.key.bias"] for i in range(L)]),
                    "wv": _stack([t(lp.format(i=i) + "attention.self.value.weight") for i in range(L)]),
                    "bv": _stack([sd[lp.format(i=i) + "attention.self.value.bias"] for i in range(L)]),
                    "wo": _stack([t(lp.format(i=i) + "attention.output.dense.weight") for i in range(L)]),
                    "bo": _stack([sd[lp.format(i=i) + "attention.output.dense.bias"] for i in range(L)]),
                },
                "ln1": {"scale": _stack([sd[lp.format(i=i) + "attention.output.LayerNorm.weight"] for i in range(L)]),
                        "bias": _stack([sd[lp.format(i=i) + "attention.output.LayerNorm.bias"] for i in range(L)])},
                "mlp": {
                    "wi": _stack([t(lp.format(i=i) + "intermediate.dense.weight") for i in range(L)]),
                    "bi": _stack([sd[lp.format(i=i) + "intermediate.dense.bias"] for i in range(L)]),
                    "wo": _stack([t(lp.format(i=i) + "output.dense.weight") for i in range(L)]),
                    "bo": _stack([sd[lp.format(i=i) + "output.dense.bias"] for i in range(L)]),
                },
                "ln2": {"scale": _stack([sd[lp.format(i=i) + "output.LayerNorm.weight"] for i in range(L)]),
                        "bias": _stack([sd[lp.format(i=i) + "output.LayerNorm.bias"] for i in range(L)])},
            },
        }
    elif family == "t5":
        # HF T5EncoderModel: shared.weight embedding; encoder.block.i.layer.0
        # = SelfAttention (+ relative_attention_bias on block 0 only, shared
        # by every layer) with pre-RMSNorm `layer_norm`; layer.1 =
        # DenseReluDense (wi or wi_0/wi_1 gated) with its own layer_norm;
        # encoder.final_layer_norm. No biases anywhere (mlp_bias=False).
        bp = "encoder.block.{i}."
        wte_key = ("shared.weight" if "shared.weight" in sd
                   else "encoder.embed_tokens.weight")
        gated = any("wi_0" in k for k in sd)
        mlp_map = {
            "wi": _stack([t(bp.format(i=i) + "layer.1.DenseReluDense."
                            + ("wi_0" if gated else "wi") + ".weight")
                          for i in range(L)]),
            "wo": _stack([t(bp.format(i=i) + "layer.1.DenseReluDense.wo.weight")
                          for i in range(L)]),
        }
        if gated:
            mlp_map["wg"] = _stack(
                [t(bp.format(i=i) + "layer.1.DenseReluDense.wi_1.weight")
                 for i in range(L)])
        params = {
            "wte": jnp.asarray(sd[wte_key], dtype),
            "rel_bias": jnp.asarray(
                sd["encoder.block.0.layer.0.SelfAttention."
                   "relative_attention_bias.weight"], dtype),
            "layers": {
                "ln1": {"scale": _stack(
                    [sd[bp.format(i=i) + "layer.0.layer_norm.weight"]
                     for i in range(L)])},
                "attn": {
                    "wq": _stack([t(bp.format(i=i) + "layer.0.SelfAttention.q.weight") for i in range(L)]),
                    "wk": _stack([t(bp.format(i=i) + "layer.0.SelfAttention.k.weight") for i in range(L)]),
                    "wv": _stack([t(bp.format(i=i) + "layer.0.SelfAttention.v.weight") for i in range(L)]),
                    "wo": _stack([t(bp.format(i=i) + "layer.0.SelfAttention.o.weight") for i in range(L)]),
                },
                "ln2": {"scale": _stack(
                    [sd[bp.format(i=i) + "layer.1.layer_norm.weight"]
                     for i in range(L)])},
                "mlp": mlp_map,
            },
            "ln_f": {"scale": jnp.asarray(sd["encoder.final_layer_norm.weight"],
                                          dtype)},
        }
    else:
        raise ValueError(f"unknown family {family!r}")

    if "lm_head.weight" in sd:
        head = {"w": jnp.asarray(sd["lm_head.weight"].T, dtype)}
        if "lm_head.bias" in sd:
            head["b"] = jnp.asarray(sd["lm_head.bias"], dtype)
        params["lm_head"] = head

    import jax
    return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)


def config_from_hf(hf_config, family: str) -> DecoderConfig:
    """Build a DecoderConfig from a transformers config object."""
    from .config import DecoderConfig as C
    if family == "neo":
        flags = [a for pattern, n in hf_config.attention_types for a in pattern * n]
        alternating = any(f == "local" for f in flags)
        return C(vocab_size=hf_config.vocab_size, hidden_size=hf_config.hidden_size,
                 num_layers=hf_config.num_layers, num_heads=hf_config.num_heads,
                 max_position_embeddings=hf_config.max_position_embeddings,
                 intermediate_size=hf_config.intermediate_size,
                 position_embedding="learned",
                 attention_layout="alternating" if alternating else "global",
                 local_window=getattr(hf_config, "window_size", 256),
                 scale_attn=False, qkv_bias=False, out_bias=True,
                 layer_norm_eps=hf_config.layer_norm_epsilon)
    if family == "gptj":
        return C(vocab_size=hf_config.vocab_size, hidden_size=hf_config.n_embd,
                 num_layers=hf_config.n_layer, num_heads=hf_config.n_head,
                 max_position_embeddings=hf_config.n_positions,
                 intermediate_size=hf_config.n_inner or 4 * hf_config.n_embd,
                 position_embedding="rotary", rotary_dim=hf_config.rotary_dim,
                 parallel_residual=True, scale_attn=True,
                 qkv_bias=False, out_bias=False,
                 layer_norm_eps=hf_config.layer_norm_epsilon)
    if family == "bloom":
        return C(vocab_size=hf_config.vocab_size, hidden_size=hf_config.hidden_size,
                 num_layers=hf_config.n_layer, num_heads=hf_config.n_head,
                 position_embedding="alibi", embedding_layernorm=True,
                 scale_attn=True, qkv_bias=True, out_bias=True,
                 layer_norm_eps=hf_config.layer_norm_epsilon)
    if family == "t5":
        act = getattr(hf_config, "feed_forward_proj", "relu")
        return C(vocab_size=hf_config.vocab_size, hidden_size=hf_config.d_model,
                 num_layers=hf_config.num_layers,
                 num_heads=hf_config.num_heads, head_dim=hf_config.d_kv,
                 intermediate_size=hf_config.d_ff,
                 position_embedding="none", scale_attn=False,
                 qkv_bias=False, out_bias=False,
                 layer_norm_eps=hf_config.layer_norm_epsilon,
                 bidirectional=True, norm_style="rms", relative_attention=True,
                 relative_attention_buckets=hf_config.relative_attention_num_buckets,
                 relative_attention_max_distance=getattr(
                     hf_config, "relative_attention_max_distance", 128),
                 mlp_activation=("gated_gelu" if "gated" in act else "relu"),
                 mlp_bias=False)
    if family == "bert":
        return C(vocab_size=hf_config.vocab_size, hidden_size=hf_config.hidden_size,
                 num_layers=hf_config.num_hidden_layers,
                 num_heads=hf_config.num_attention_heads,
                 max_position_embeddings=hf_config.max_position_embeddings,
                 intermediate_size=hf_config.intermediate_size,
                 position_embedding="learned", scale_attn=True, qkv_bias=True,
                 out_bias=True, layer_norm_eps=hf_config.layer_norm_eps,
                 bidirectional=True, post_layernorm=True,
                 embedding_layernorm=True,
                 token_type_vocab=hf_config.type_vocab_size, gelu_exact=True)
    raise ValueError(f"unknown family {family!r}")


FAMILY_PATTERNS = (
    ("bloom", ("bloom",)),
    ("gptj", ("gpt-j", "gptj", "6.1b", "5.8b")),
    ("neo", ("gpt-neo", "gptneo", "125m", "1.3b", "2.7b")),
    ("t5", ("t5",)),
    # last: "bert" also matches roberta/distilbert names, which are NOT
    # this architecture — prefer AutoConfig.model_type when weights exist
    ("bert", ("bert",)),
)


def guess_family(name: str) -> str:
    low = name.lower()
    for fam, pats in FAMILY_PATTERNS:
        if any(p in low for p in pats):
            return fam
    return "neo"


def load_pretrained(name_or_path: str, family: str | None = None, dtype=jnp.float32):
    """Load an HF checkpoint from a local path/cache (zero-egress friendly).

    Returns (params, cfg). Requires `transformers` + weights available locally.
    Loads the *ForCausalLM head so untied LM heads (GPT-J: tie_word_embeddings
    False) are kept — decoder.logits() would otherwise silently fall back to
    the wte tie and cross-encoder scores would be wrong.
    """
    from transformers import AutoConfig, AutoModel, AutoModelForCausalLM
    hf_cfg = AutoConfig.from_pretrained(name_or_path)
    # the config's model_type is authoritative when available (name-pattern
    # guessing would mistake e.g. roberta for bert)
    if family is None and getattr(hf_cfg, "model_type", None) in ("bert", "t5"):
        family = hf_cfg.model_type
    family = family or guess_family(name_or_path)
    if family == "bert":
        model = AutoModel.from_pretrained(name_or_path)  # no causal-LM head
    elif family == "t5":
        # the ST fork's models.T5 drives only the ENCODER half
        # (sentence_transformers/models/T5.py:36: `t5model.encoder(...)`)
        from transformers import T5EncoderModel
        model = T5EncoderModel.from_pretrained(name_or_path)
    else:
        model = AutoModelForCausalLM.from_pretrained(name_or_path)
    cfg = config_from_hf(hf_cfg, family)
    sd = dict(model.state_dict())
    if getattr(hf_cfg, "tie_word_embeddings", True):
        sd.pop("lm_head.weight", None)  # tied: logits() uses wte directly
        sd.pop("lm_head.bias", None)
    params = convert_hf_state_dict(sd, cfg, family, dtype=dtype)
    return params, cfg
