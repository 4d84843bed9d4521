"""TPU-native CLIP dual-tower (text transformer + ViT vision transformer).

Backs the ST fork's `models.CLIPModel`
(sentence_transformers/models/CLIPModel.py — a thin HF wrapper whose forward
routes a mixed image/text batch through the two towers and interleaves the
projected embeddings back into input order, :20-46). Here both towers are
the SAME unified transformer (models/decoder.py) under different structural
switches — no separate vision/text model classes:

  text tower:   CAUSAL attention (CLIP's text encoder is autoregressive),
                learned positions, quick-GELU MLP, pooled at the EOT token
                (the highest token id, HF `CLIPTextModel` argmax semantics),
                then `text_projection`.
  vision tower: patchify = reshape + ONE matmul (the reference's strided
                Conv2d is exactly a linear map over flattened patches — an
                MXU-shaped matmul instead of a conv lowering), class token
                prepended (stored as the tower's 1-row `wte`), learned
                positions, pre-LN (`emb_ln` = HF `pre_layrnorm`),
                bidirectional blocks, ln_f on the class token
                (HF `post_layernorm`), then `visual_projection`.

Images are (B, 3, H, W) float arrays already resized/normalized (the
reference delegates that to CLIPProcessor; `preprocess_images` here covers
the same resize+center-crop+normalize for raw uint8 arrays).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .config import DecoderConfig
from .decoder import forward
from .params import init_params, param_shapes

# CLIPProcessor normalization constants (HF image_processing_clip.py)
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    text: DecoderConfig
    vision: DecoderConfig
    image_size: int = 224
    patch_size: int = 32
    projection_dim: int = 512

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    def replace(self, **kw) -> "CLIPConfig":
        return dataclasses.replace(self, **kw)


def _tower(D, L, H, *, causal: bool, ctx: int, quick=True, **kw) -> DecoderConfig:
    return DecoderConfig(
        vocab_size=kw.pop("vocab_size", 1), hidden_size=D, num_layers=L,
        num_heads=H, max_position_embeddings=ctx,
        position_embedding="learned", scale_attn=True,
        qkv_bias=True, out_bias=True, layer_norm_eps=1e-5,
        bidirectional=not causal, mlp_activation="quick_gelu" if quick else None,
        **kw)


def clip_vit_b_32(**kw) -> CLIPConfig:
    """openai/clip-vit-base-patch32 geometry."""
    return CLIPConfig(
        text=_tower(512, 12, 8, causal=True, ctx=77, vocab_size=49408),
        vision=_tower(768, 12, 12, causal=False, ctx=50,
                      embedding_layernorm=True),
        image_size=224, patch_size=32, projection_dim=512, **kw)


def clip_tiny(**kw) -> CLIPConfig:
    """Small config for tests (mirrors models.config.tiny)."""
    return CLIPConfig(
        text=_tower(32, 2, 2, causal=True, ctx=16, vocab_size=99),
        vision=_tower(48, 2, 2, causal=False, ctx=10,
                      embedding_layernorm=True),
        image_size=12, patch_size=4, projection_dim=24, **kw)


def clip_param_shapes(cfg: CLIPConfig) -> dict:
    p = cfg.patch_size
    return {
        "text": param_shapes(cfg.text),
        # vision wte is the CLASS embedding (1 row); ctx = 1 + num_patches
        "vision": param_shapes(cfg.vision),
        "patch_w": (3 * p * p, cfg.vision.hidden_size),
        "text_proj": (cfg.text.hidden_size, cfg.projection_dim),
        "visual_proj": (cfg.vision.hidden_size, cfg.projection_dim),
        "logit_scale": (),
    }


def init_clip_params(cfg: CLIPConfig, key: jax.Array, dtype=None) -> dict:
    kt, kv, kp, k1, k2 = jax.random.split(key, 5)
    dtype = dtype or cfg.text.dtype
    p = cfg.patch_size
    return {
        "text": init_params(cfg.text, kt, dtype),
        "vision": init_params(cfg.vision, kv, dtype),
        "patch_w": 0.02 * jax.random.normal(
            kp, (3 * p * p, cfg.vision.hidden_size), dtype),
        "text_proj": 0.02 * jax.random.normal(
            k1, (cfg.text.hidden_size, cfg.projection_dim), dtype),
        "visual_proj": 0.02 * jax.random.normal(
            k2, (cfg.vision.hidden_size, cfg.projection_dim), dtype),
        "logit_scale": jnp.asarray(2.6592, dtype),  # ln(1/0.07), HF init
    }


def patchify(pixels: jax.Array, patch: int) -> jax.Array:
    """(B, 3, H, W) → (B, P, 3·p·p), channel-major within a patch — the
    flatten order of HF's Conv2d weight (D, 3, p, p), so `@ patch_w`
    reproduces the strided conv exactly."""
    B, C, H, W = pixels.shape
    gh, gw = H // patch, W // patch
    x = pixels.reshape(B, C, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)               # (B, gh, gw, C, p, p)
    return x.reshape(B, gh * gw, C * patch * patch)


@partial(jax.jit, static_argnames=("cfg",))
def encode_image(params: dict, pixels: jax.Array, cfg: CLIPConfig) -> jax.Array:
    """(B, 3, H, W) preprocessed pixels → (B, projection_dim) image embeds
    (unnormalized, HF `CLIPModel.get_image_features` semantics)."""
    dt = cfg.vision.dtype
    patches = patchify(pixels.astype(dt), cfg.patch_size)      # (B, P, 3pp)
    emb = patches @ params["patch_w"].astype(dt)               # (B, P, D)
    B = emb.shape[0]
    cls = jnp.broadcast_to(params["vision"]["wte"].astype(dt),
                           (B, 1, emb.shape[-1]))
    embeds = jnp.concatenate([cls, emb], axis=1)               # (B, 1+P, D)
    mask = jnp.ones(embeds.shape[:2], jnp.int32)
    h = forward(params["vision"], None, mask, cfg.vision,
                inputs_embeds=embeds)                          # ln_f applied
    pooled = h[:, 0]                                           # class token
    return pooled @ params["visual_proj"].astype(pooled.dtype)


@partial(jax.jit, static_argnames=("cfg",))
def encode_text(params: dict, input_ids: jax.Array, attention_mask: jax.Array,
                cfg: CLIPConfig) -> jax.Array:
    """(B, T) token ids → (B, projection_dim) text embeds. Pooled at the
    EOT position = argmax of token ids (HF CLIPTextModel: CLIP's EOT is the
    highest id in the vocab)."""
    h = forward(params["text"], input_ids, attention_mask, cfg.text)
    eot = jnp.argmax(input_ids, axis=-1)
    pooled = jnp.take_along_axis(h, eot[:, None, None].repeat(
        h.shape[-1], axis=-1), axis=1)[:, 0]
    return pooled @ params["text_proj"].astype(pooled.dtype)


def preprocess_images(images: Sequence[np.ndarray],
                      image_size: int = 224) -> np.ndarray:
    """uint8 (H, W, 3) arrays → (B, 3, S, S) float32, CLIPProcessor
    semantics: resize shortest side to S (bilinear), center-crop S×S,
    scale to [0,1], normalize with the CLIP mean/std."""
    out = []
    mean = np.asarray(IMAGE_MEAN, np.float32)[:, None, None]
    std = np.asarray(IMAGE_STD, np.float32)[:, None, None]
    for im in images:
        a = np.asarray(im)
        if a.ndim == 2:
            a = np.stack([a] * 3, axis=-1)
        h, w = a.shape[:2]
        scale = image_size / min(h, w)
        nh, nw = max(image_size, round(h * scale)), max(image_size, round(w * scale))
        a = _bilinear_resize(a.astype(np.float32), nh, nw)
        top, left = (nh - image_size) // 2, (nw - image_size) // 2
        a = a[top:top + image_size, left:left + image_size]
        a = a.transpose(2, 0, 1) / 255.0
        out.append((a - mean) / std)
    return np.stack(out)


def _bilinear_resize(img: np.ndarray, nh: int, nw: int) -> np.ndarray:
    h, w = img.shape[:2]
    if (h, w) == (nh, nw):
        return img
    ys = (np.arange(nh) + 0.5) * h / nh - 0.5
    xs = (np.arange(nw) + 0.5) * w / nw - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------------------
# HF checkpoint import
# ---------------------------------------------------------------------------

def convert_hf_clip(state_dict, cfg: CLIPConfig, dtype=jnp.float32) -> dict:
    """Map transformers `CLIPModel.state_dict()` into the dual-tower tree."""
    from .hf_loader import _np

    sd = {k: _np(v) for k, v in state_dict.items()}

    def tower(prefix: str, tcfg: DecoderConfig, is_vision: bool) -> dict:
        L = tcfg.num_layers
        lp = prefix + "encoder.layers.{i}."

        def t(name):
            return sd[name].T

        def stack(fmt, transpose=False):
            rows = [sd[fmt.format(i=i)] for i in range(L)]
            if transpose:
                rows = [r.T for r in rows]
            return jnp.asarray(np.stack(rows), dtype)

        tree = {
            "layers": {
                "ln1": {"scale": stack(lp + "layer_norm1.weight"),
                        "bias": stack(lp + "layer_norm1.bias")},
                "attn": {
                    "wq": stack(lp + "self_attn.q_proj.weight", True),
                    "bq": stack(lp + "self_attn.q_proj.bias"),
                    "wk": stack(lp + "self_attn.k_proj.weight", True),
                    "bk": stack(lp + "self_attn.k_proj.bias"),
                    "wv": stack(lp + "self_attn.v_proj.weight", True),
                    "bv": stack(lp + "self_attn.v_proj.bias"),
                    "wo": stack(lp + "self_attn.out_proj.weight", True),
                    "bo": stack(lp + "self_attn.out_proj.bias"),
                },
                "ln2": {"scale": stack(lp + "layer_norm2.weight"),
                        "bias": stack(lp + "layer_norm2.bias")},
                "mlp": {
                    "wi": stack(lp + "mlp.fc1.weight", True),
                    "bi": stack(lp + "mlp.fc1.bias"),
                    "wo": stack(lp + "mlp.fc2.weight", True),
                    "bo": stack(lp + "mlp.fc2.bias"),
                },
            },
        }
        if is_vision:
            tree["wte"] = jnp.asarray(
                sd[prefix + "embeddings.class_embedding"].reshape(1, -1), dtype)
            tree["wpe"] = jnp.asarray(
                sd[prefix + "embeddings.position_embedding.weight"], dtype)
            tree["emb_ln"] = {
                "scale": jnp.asarray(sd[prefix + "pre_layrnorm.weight"], dtype),
                "bias": jnp.asarray(sd[prefix + "pre_layrnorm.bias"], dtype)}
            tree["ln_f"] = {
                "scale": jnp.asarray(sd[prefix + "post_layernorm.weight"], dtype),
                "bias": jnp.asarray(sd[prefix + "post_layernorm.bias"], dtype)}
        else:
            tree["wte"] = jnp.asarray(
                sd[prefix + "embeddings.token_embedding.weight"], dtype)
            tree["wpe"] = jnp.asarray(
                sd[prefix + "embeddings.position_embedding.weight"], dtype)
            tree["ln_f"] = {
                "scale": jnp.asarray(sd[prefix + "final_layer_norm.weight"], dtype),
                "bias": jnp.asarray(sd[prefix + "final_layer_norm.bias"], dtype)}
        return tree

    D_v = cfg.vision.hidden_size
    return {
        "text": tower("text_model.", cfg.text, is_vision=False),
        "vision": tower("vision_model.", cfg.vision, is_vision=True),
        # Conv2d (D, 3, p, p) → flattened-patch matmul weight (3pp, D);
        # the (3, p, p) flatten order matches patchify()
        "patch_w": jnp.asarray(
            sd["vision_model.embeddings.patch_embedding.weight"]
            .reshape(D_v, -1).T, dtype),
        "text_proj": jnp.asarray(sd["text_projection.weight"].T, dtype),
        "visual_proj": jnp.asarray(sd["visual_projection.weight"].T, dtype),
        "logit_scale": jnp.asarray(sd["logit_scale"], dtype),
    }


def clip_config_from_hf(hf_config) -> CLIPConfig:
    tc, vc = hf_config.text_config, hf_config.vision_config
    return CLIPConfig(
        text=_tower(tc.hidden_size, tc.num_hidden_layers,
                    tc.num_attention_heads, causal=True,
                    ctx=tc.max_position_embeddings, vocab_size=tc.vocab_size,
                    intermediate_size=tc.intermediate_size),
        vision=_tower(vc.hidden_size, vc.num_hidden_layers,
                      vc.num_attention_heads, causal=False,
                      ctx=1 + (vc.image_size // vc.patch_size) ** 2,
                      embedding_layernorm=True,
                      intermediate_size=vc.intermediate_size),
        image_size=vc.image_size, patch_size=vc.patch_size,
        projection_dim=hf_config.projection_dim)


class CLIPEncoder:
    """ST `models.CLIPModel` runtime semantics: a mixed list of texts and
    images embeds to one (N, projection_dim) array in input order
    (sentence_transformers/models/CLIPModel.py:20-46 interleaves via
    `image_text_info`). Images are numpy (H, W, 3) uint8 or pre-processed
    (3, S, S) float arrays; everything else is a text."""

    def __init__(self, params, cfg: CLIPConfig, tokenizer, *,
                 normalize_embeddings: bool = False, batch_size: int = 32):
        self.params, self.cfg = params, cfg
        self.tokenizer = tokenizer
        self.normalize = normalize_embeddings
        self.batch_size = batch_size
        self.out_dim = cfg.projection_dim

    def _encode_texts(self, texts):
        ctx = self.cfg.text.max_position_embeddings
        eot = self.cfg.text.vocab_size - 1  # CLIP: EOT is the top vocab id
        rows = [[min(i, eot - 1) for i in self.tokenizer.encode(t)][: ctx - 1]
                + [eot] for t in texts]
        T = max(len(r) for r in rows)
        ids = np.zeros((len(rows), T), np.int32)
        mask = np.zeros((len(rows), T), np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return np.asarray(encode_text(self.params, jnp.asarray(ids),
                                      jnp.asarray(mask), self.cfg),
                          np.float32)

    def _encode_images(self, images):
        arrs = []
        for im in images:
            a = np.asarray(im)
            if a.ndim == 3 and a.shape[0] == 3 and a.dtype != np.uint8:
                arrs.append(a.astype(np.float32))  # already (3, S, S)
            else:
                arrs.append(preprocess_images([a], self.cfg.image_size)[0])
        return np.asarray(encode_image(self.params,
                                       jnp.asarray(np.stack(arrs)), self.cfg),
                          np.float32)

    def encode(self, items: Sequence, **_) -> np.ndarray:
        is_image = [not isinstance(x, str) for x in items]
        out = np.zeros((len(items), self.out_dim), np.float32)
        texts = [(i, x) for i, (x, im) in enumerate(zip(items, is_image))
                 if not im]
        images = [(i, x) for i, (x, im) in enumerate(zip(items, is_image))
                  if im]
        for s in range(0, len(texts), self.batch_size):
            chunk = texts[s : s + self.batch_size]
            emb = self._encode_texts([x for _, x in chunk])
            for (i, _), e in zip(chunk, emb):
                out[i] = e
        for s in range(0, len(images), self.batch_size):
            chunk = images[s : s + self.batch_size]
            emb = self._encode_images([x for _, x in chunk])
            for (i, _), e in zip(chunk, emb):
                out[i] = e
        if self.normalize:
            out /= np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-12)
        return out
