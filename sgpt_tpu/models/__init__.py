from .config import DecoderConfig, gpt_neo, gpt_j_6b, bloom, bert, t5, tiny
from .decoder import forward, logits
from .params import init_params, param_shapes, count_params, cast_params
from .hf_loader import convert_hf_state_dict, config_from_hf, load_pretrained, guess_family
from .clip import (CLIPConfig, CLIPEncoder, clip_vit_b_32, clip_tiny,
                   init_clip_params, convert_hf_clip, clip_config_from_hf)

__all__ = [
    "DecoderConfig", "gpt_neo", "gpt_j_6b", "bloom", "bert", "t5", "tiny",
    "forward", "logits",
    "init_params", "param_shapes", "count_params", "cast_params",
    "convert_hf_state_dict", "config_from_hf", "load_pretrained", "guess_family",
    "CLIPConfig", "CLIPEncoder", "clip_vit_b_32", "clip_tiny",
    "init_clip_params", "convert_hf_clip", "clip_config_from_hf",
]
