from .config import DecoderConfig, gpt_neo, gpt_j_6b, bloom, bert, tiny
from .decoder import forward, logits
from .params import init_params, param_shapes, count_params, cast_params
from .hf_loader import convert_hf_state_dict, config_from_hf, load_pretrained, guess_family

__all__ = [
    "DecoderConfig", "gpt_neo", "gpt_j_6b", "bloom", "bert", "tiny",
    "forward", "logits",
    "init_params", "param_shapes", "count_params", "cast_params",
    "convert_hf_state_dict", "config_from_hf", "load_pretrained", "guess_family",
]
