"""Device mesh construction.

The single-controller replacement for the reference's process-world plumbing
(HF Accelerate DDP ranks, `accelerate config` topology files — SURVEY.md §2c):
one process, one `jax.sharding.Mesh` with named axes

    dp — data parallel (batch / corpus sharding; spans DCN across pod slices)
    tp — tensor parallel (Megatron-style weight partitioning over ICI)

All collectives are XLA-inserted from sharding annotations; nothing here opens
sockets or spawns workers.

Topology awareness: on multi-slice deployments (TPU pods connected over DCN,
`device.slice_index` differs) the dp axis is laid out slice-major so every
tp group — the axis with all-reduce/all-gather on EVERY layer — lives inside
one slice's ICI, and only dp gradient/embedding collectives (once per step /
per batch) cross DCN. Within a slice, devices order by physical ICI coords
via `jax.experimental.mesh_utils` so tp neighbours are wire neighbours.
Single-slice (including the virtual CPU test mesh) degrades to the same
(dp, tp) reshape as before.

Pod-slice recipe (README "Multi-slice meshes"): tp = chips per model shard
(must divide the slice size), dp = everything else; `make_mesh(dp=-1, tp=8)`
on 4×v5e-256 slices yields dp=128 slice-major rows × tp=8 ICI columns.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def _slice_id(d) -> int:
    """Slice index of a device: multi-slice TPU exposes `slice_index`; fall
    back to 0 (single slice — CPU/GPU/virtual devices)."""
    s = getattr(d, "slice_index", None)
    return int(s) if s is not None else 0


def _order_within_slice(devices, shape):
    """ICI-aware (rows, cols) arrangement of one slice's devices.

    Delegates to jax.experimental.mesh_utils when the devices carry physical
    coords (real TPU) so tp columns are ICI-contiguous; anything without
    coords (virtual CPU devices, test stubs) keeps list order."""
    if all(getattr(d, "coords", None) is not None for d in devices):
        try:
            from jax.experimental import mesh_utils
            return np.asarray(
                mesh_utils.create_device_mesh(shape, devices=devices,
                                              contiguous_submeshes=False))
        except Exception:  # unknown device kind / unsupported topology
            pass
    return np.asarray(devices, dtype=object).reshape(shape)


def arrange_devices(devices: Sequence, dp: int, tp: int) -> np.ndarray:
    """(dp, tp) device array with tp inside a slice and dp spanning slices.

    Pure arrangement logic (no Mesh construction) so topology handling is
    unit-testable with stub devices. Raises if tp would cross a DCN slice
    boundary or the dp×tp factorization doesn't tile the slices evenly."""
    n = len(devices)
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    slices: dict = {}
    for d in devices:
        slices.setdefault(_slice_id(d), []).append(d)
    sizes = {len(v) for v in slices.values()}
    if len(slices) == 1:
        return _order_within_slice(devices, (dp, tp))
    if len(sizes) != 1:
        raise ValueError(f"uneven slices: {sorted((k, len(v)) for k, v in slices.items())}")
    per_slice = sizes.pop()
    if per_slice % tp:
        raise ValueError(
            f"tp={tp} does not divide the slice size {per_slice}: a tp group "
            "would span DCN — per-layer collectives must stay on ICI")
    # dp rows: slice-major (slice 0's rows, then slice 1's, ...) so the
    # leading dp dimension maps contiguous row ranges to slices
    rows = [
        _order_within_slice(slices[sid], (per_slice // tp, tp))
        for sid in sorted(slices)
    ]
    return np.concatenate(rows, axis=0)


def make_mesh(dp: int = -1, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh. dp=-1 means 'all remaining devices'.

    Multi-slice topologies place tp inside each slice's ICI and dp across
    slices (DCN) — see arrange_devices. Requesting fewer than all devices
    (dp*tp < n) takes a prefix, kept within whole slices when possible."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        # prefix subset; prefer whole slices so the arrangement invariants hold
        devices.sort(key=_slice_id)
        devices = devices[: dp * tp]
    return Mesh(arrange_devices(devices, dp, tp), axis_names=("dp", "tp"))


def default_mesh() -> Mesh:
    """All devices data-parallel — the right default for encode/serve."""
    return make_mesh(dp=-1, tp=1)
