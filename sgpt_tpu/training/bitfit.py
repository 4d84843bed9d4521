"""BitFit (bias-only fine-tuning) as an optax transform mask.

The reference freezes everything whose name lacks "bias"
(examples/training/nli/training_nli_v2.py:87-92 `--freezenonbias`), optionally
un-freezing the token embedding (`--unfreezewte`,
examples/training/ms_marco/train_bi-encoder_mnrl.py:75-77). In our pytree the
bias-family leaves are named bias/bi/bo/bq/bk/bv (models/params.py); layernorm
`bias` leaves count as biases (they do in torch naming too), `scale` does not.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import optax

BIAS_NAMES = frozenset({"bias", "bi", "bo", "bq", "bk", "bv"})


def bitfit_mask(params: Any, *, train_wte: bool = False,
                extra_trainable: Callable[[tuple], bool] | None = None) -> Any:
    """True = trainable. Biases only (+wte / extra predicate if requested)."""

    def leaf_mask(path, _leaf) -> bool:
        keys = [p.key for p in path if hasattr(p, "key")]
        name = keys[-1]
        if name in BIAS_NAMES:
            return True
        if train_wte and name == "wte":
            return True
        if extra_trainable is not None and extra_trainable(tuple(keys)):
            return True
        return False

    return jax.tree_util.tree_map_with_path(leaf_mask, params)


def masked_optimizer(base: optax.GradientTransformation, params: Any,
                     **mask_kw) -> optax.GradientTransformation:
    """Apply `base` to BitFit-trainable leaves, zero updates elsewhere."""
    mask = bitfit_mask(params, **mask_kw)
    inv = jax.tree.map(lambda m: not m, mask)
    # optax.masked leaves un-masked updates UNCHANGED, so frozen leaves must be
    # explicitly zeroed (the torch analog is requires_grad=False).
    return optax.chain(optax.masked(base, mask),
                       optax.masked(optax.set_to_zero(), inv))


def trainable_count(params: Any, **mask_kw) -> int:
    mask = bitfit_mask(params, **mask_kw)
    sizes = jax.tree.map(lambda m, p: int(p.size) if m else 0, mask, params)
    return sum(jax.tree.leaves(sizes))
