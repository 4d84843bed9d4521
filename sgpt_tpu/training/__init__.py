from .bitfit import bitfit_mask, masked_optimizer, trainable_count
from .gradcache import chunk_tree, gradcache_value_and_grad
from .schedules import make_schedule, warmup_linear
from .trainer import ContrastiveTrainer, TrainConfig
from .checkpoint import save_checkpoint, load_checkpoint, prune_checkpoints
from .tsdae import TSDAETrainer, tsdae_loss, init_tsdae_params

__all__ = [
    "bitfit_mask", "masked_optimizer", "trainable_count",
    "chunk_tree", "gradcache_value_and_grad",
    "make_schedule", "warmup_linear",
    "ContrastiveTrainer", "TrainConfig",
    "save_checkpoint", "load_checkpoint", "prune_checkpoints",
    "TSDAETrainer", "tsdae_loss", "init_tsdae_params",
]
