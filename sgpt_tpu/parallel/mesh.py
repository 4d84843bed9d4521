"""Device mesh construction.

The single-controller replacement for the reference's process-world plumbing
(HF Accelerate DDP ranks, `accelerate config` topology files — SURVEY.md §2c):
one process, one `jax.sharding.Mesh` with named axes

    dp — data parallel (batch / corpus sharding; DCN-friendly across slices)
    tp — tensor parallel (Megatron-style weight partitioning over ICI)

All collectives are XLA-inserted from sharding annotations; nothing here opens
sockets or spawns workers.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = -1, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh. dp=-1 means 'all remaining devices'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        devices = devices[: dp * tp]
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def default_mesh() -> Mesh:
    """All devices data-parallel — the right default for encode/serve."""
    return make_mesh(dp=-1, tp=1)
