from .pooling import (
    pool, mean_pool, weighted_mean_pool, learned_weighted_mean_pool,
    last_token_pool, mean_mean_pool, last_token_mean_pool, max_pool, cls_pool,
    normalize, POOLERS, STACK_POOLERS,
)
from .quant import (
    quantize_weight, quantize_decoder_params, int8_project, dequantize_weight,
)
from .similarity import cos_sim, dot_score, pairwise_cos_sim
from .topk import chunked_topk, merge_topk, blockmax_topk

__all__ = [
    "pool", "mean_pool", "weighted_mean_pool", "learned_weighted_mean_pool",
    "last_token_pool", "mean_mean_pool", "last_token_mean_pool", "max_pool",
    "cls_pool", "normalize", "POOLERS", "STACK_POOLERS",
    "cos_sim", "dot_score", "pairwise_cos_sim",
    "quantize_weight", "quantize_decoder_params", "int8_project",
    "dequantize_weight",
    "chunked_topk", "merge_topk", "blockmax_topk",
]
