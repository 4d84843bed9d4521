"""LR schedules matching the ST fit() options
(ref: sentence_transformers/SentenceTransformer.py:940-957 `_get_scheduler`:
constantlr / warmupconstant / warmuplinear / warmupcosine / warmupcosinewithhardrestarts).
"""
from __future__ import annotations

import optax


def warmup_linear(lr: float, warmup_steps: int, total_steps: int):
    """Linear warmup 0→lr over warmup_steps, then linear decay lr→0."""
    warmup_steps = max(warmup_steps, 1)
    return optax.join_schedules(
        [optax.linear_schedule(0.0, lr, warmup_steps),
         optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))],
        boundaries=[warmup_steps])


def warmup_cosine(lr: float, warmup_steps: int, total_steps: int):
    return optax.warmup_cosine_decay_schedule(
        0.0, lr, max(warmup_steps, 1), max(total_steps, warmup_steps + 1), 0.0)


def make_schedule(name: str, lr: float, warmup_steps: int, total_steps: int):
    name = name.lower()
    if name == "constantlr":
        return optax.constant_schedule(lr)
    if name == "warmupconstant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
             optax.constant_schedule(lr)],
            boundaries=[max(warmup_steps, 1)])
    if name == "warmuplinear":
        return warmup_linear(lr, warmup_steps, total_steps)
    if name == "warmupcosine":
        return warmup_cosine(lr, warmup_steps, total_steps)
    if name == "warmupcosinewithhardrestarts":
        return warmup_cosine_hard_restarts(lr, warmup_steps, total_steps)
    raise ValueError(f"unknown scheduler {name!r}")


def warmup_cosine_hard_restarts(lr: float, warmup_steps: int, total_steps: int,
                                cycles: int = 1):
    """Linear warmup, then `cycles` cosine decays lr→0 each restarting at lr
    (transformers get_cosine_with_hard_restarts_schedule_with_warmup, which
    ST's fit() dispatches for 'warmupcosinewithhardrestarts' with the
    transformers DEFAULT num_cycles=1 — the old cycles=3 default gave a
    materially different LR trajectory than the parity target)."""
    warmup_steps = max(warmup_steps, 1)
    decay_total = max(total_steps - warmup_steps, cycles)
    seg = decay_total // cycles
    schedules = [optax.linear_schedule(0.0, lr, warmup_steps)]
    boundaries = [warmup_steps]
    for c in range(cycles):
        steps = seg if c < cycles - 1 else decay_total - seg * (cycles - 1)
        schedules.append(optax.cosine_decay_schedule(lr, max(steps, 1)))
        if c < cycles - 1:
            boundaries.append(boundaries[-1] + steps)
    return optax.join_schedules(schedules, boundaries=boundaries)
