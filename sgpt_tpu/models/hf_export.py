"""Export the decoder pytree back to HuggingFace state-dict naming.

Inverse of hf_loader.convert_hf_state_dict — lets models fine-tuned here (e.g.
BitFit-updated biases) round-trip into the reference's torch/sentence-
transformers ecosystem for verification or deployment.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .config import DecoderConfig


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def to_hf_state_dict(params: dict, cfg: DecoderConfig, family: str,
                     style: str = "auto") -> Dict[str, np.ndarray]:
    """Returns {hf_param_name: numpy array} ([out,in] torch layout).

    style: 'base' (GPTNeoModel-style flat keys), 'causal_lm' (body under
    'transformer.' with lm_head at top level — what *ForCausalLM.from_pretrained
    expects, REQUIRED for untied heads like GPT-J's), or 'auto' (causal_lm iff
    an lm_head is present)."""
    L = cfg.num_layers
    H, Dh, D = cfg.num_heads, cfg.head_size, cfg.hidden_size
    layers = params["layers"]
    sd: Dict[str, np.ndarray] = {}

    def layer(tree, i):
        return {k: _np(v[i]) for k, v in tree.items()}

    if family == "neo":
        sd["wte.weight"] = _np(params["wte"])
        sd["wpe.weight"] = _np(params["wpe"])
        for i in range(L):
            a = layer(layers["attn"], i)
            m = layer(layers["mlp"], i)
            sd[f"h.{i}.ln_1.weight"] = _np(layers["ln1"]["scale"][i])
            sd[f"h.{i}.ln_1.bias"] = _np(layers["ln1"]["bias"][i])
            sd[f"h.{i}.attn.attention.q_proj.weight"] = a["wq"].T
            sd[f"h.{i}.attn.attention.k_proj.weight"] = a["wk"].T
            sd[f"h.{i}.attn.attention.v_proj.weight"] = a["wv"].T
            sd[f"h.{i}.attn.attention.out_proj.weight"] = a["wo"].T
            sd[f"h.{i}.attn.attention.out_proj.bias"] = a["bo"]
            sd[f"h.{i}.ln_2.weight"] = _np(layers["ln2"]["scale"][i])
            sd[f"h.{i}.ln_2.bias"] = _np(layers["ln2"]["bias"][i])
            sd[f"h.{i}.mlp.c_fc.weight"] = m["wi"].T
            sd[f"h.{i}.mlp.c_fc.bias"] = m["bi"]
            sd[f"h.{i}.mlp.c_proj.weight"] = m["wo"].T
            sd[f"h.{i}.mlp.c_proj.bias"] = m["bo"]
    elif family == "gptj":
        sd["wte.weight"] = _np(params["wte"])
        for i in range(L):
            a = layer(layers["attn"], i)
            m = layer(layers["mlp"], i)
            sd[f"h.{i}.ln_1.weight"] = _np(layers["ln1"]["scale"][i])
            sd[f"h.{i}.ln_1.bias"] = _np(layers["ln1"]["bias"][i])
            sd[f"h.{i}.attn.q_proj.weight"] = a["wq"].T
            sd[f"h.{i}.attn.k_proj.weight"] = a["wk"].T
            sd[f"h.{i}.attn.v_proj.weight"] = a["wv"].T
            sd[f"h.{i}.attn.out_proj.weight"] = a["wo"].T
            sd[f"h.{i}.mlp.fc_in.weight"] = m["wi"].T
            sd[f"h.{i}.mlp.fc_in.bias"] = m["bi"]
            sd[f"h.{i}.mlp.fc_out.weight"] = m["wo"].T
            sd[f"h.{i}.mlp.fc_out.bias"] = m["bo"]
    elif family == "bloom":
        sd["word_embeddings.weight"] = _np(params["wte"])
        sd["word_embeddings_layernorm.weight"] = _np(params["emb_ln"]["scale"])
        sd["word_embeddings_layernorm.bias"] = _np(params["emb_ln"]["bias"])
        for i in range(L):
            a = layer(layers["attn"], i)
            m = layer(layers["mlp"], i)
            sd[f"h.{i}.input_layernorm.weight"] = _np(layers["ln1"]["scale"][i])
            sd[f"h.{i}.input_layernorm.bias"] = _np(layers["ln1"]["bias"][i])
            # re-fuse qkv head-major: (H, 3, Dh, D)
            wq = a["wq"].T.reshape(H, Dh, D)
            wk = a["wk"].T.reshape(H, Dh, D)
            wv = a["wv"].T.reshape(H, Dh, D)
            fused = np.stack([wq, wk, wv], axis=1).reshape(3 * D_out(H, Dh), D)
            sd[f"h.{i}.self_attention.query_key_value.weight"] = fused
            bq = a["bq"].reshape(H, Dh)
            bk = a["bk"].reshape(H, Dh)
            bv = a["bv"].reshape(H, Dh)
            sd[f"h.{i}.self_attention.query_key_value.bias"] = np.stack(
                [bq, bk, bv], axis=1).reshape(3 * H * Dh)
            sd[f"h.{i}.self_attention.dense.weight"] = a["wo"].T
            sd[f"h.{i}.self_attention.dense.bias"] = a["bo"]
            sd[f"h.{i}.post_attention_layernorm.weight"] = _np(layers["ln2"]["scale"][i])
            sd[f"h.{i}.post_attention_layernorm.bias"] = _np(layers["ln2"]["bias"][i])
            sd[f"h.{i}.mlp.dense_h_to_4h.weight"] = m["wi"].T
            sd[f"h.{i}.mlp.dense_h_to_4h.bias"] = m["bi"]
            sd[f"h.{i}.mlp.dense_4h_to_h.weight"] = m["wo"].T
            sd[f"h.{i}.mlp.dense_4h_to_h.bias"] = m["bo"]
    else:
        raise ValueError(f"unknown family {family!r}")

    sd["ln_f.weight"] = _np(params["ln_f"]["scale"])
    sd["ln_f.bias"] = _np(params["ln_f"]["bias"])

    if style == "auto":
        style = "causal_lm" if "lm_head" in params else "base"
    if style == "causal_lm":
        # HF *ForCausalLM checkpoints keep the body under 'transformer.' and
        # the head at top level; a flat dict would load as base-model-only and
        # silently DROP an untied lm_head
        sd = {f"transformer.{k}": v for k, v in sd.items()}
    if "lm_head" in params:
        sd["lm_head.weight"] = _np(params["lm_head"]["w"]).T
        if "b" in params["lm_head"]:
            sd["lm_head.bias"] = _np(params["lm_head"]["b"])
    return sd


def D_out(H: int, Dh: int) -> int:
    return H * Dh


def save_hf_checkpoint(path: str, params: dict, cfg: DecoderConfig, family: str,
                       style: str = "auto"):
    """Write a torch-loadable pytorch_model.bin (requires torch)."""
    import os

    import torch

    os.makedirs(path, exist_ok=True)
    sd = {k: torch.from_numpy(v.copy()) for k, v in
          to_hf_state_dict(params, cfg, family, style=style).items()}
    torch.save(sd, os.path.join(path, "pytorch_model.bin"))
