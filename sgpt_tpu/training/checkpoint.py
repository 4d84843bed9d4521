"""Checkpointing — Orbax-backed save/restore with retention pruning.

The reference saves full model dirs every `checkpoint_save_steps` and prunes to
`checkpoint_save_total_limit` (SentenceTransformer.py:832-834,878-891); model
selection across step checkpoints happens post-hoc
(beir_dense_retriever.py:543-592). Same lifecycle here, plus optimizer state
(which the reference never persisted — fresh fit each run, SURVEY.md §5).
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np


def _as_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    step: Optional[int] = None, metadata: Optional[dict] = None):
    """Save params (+optional opt state) under `path`. Orbax if usable, else npz."""
    os.makedirs(path, exist_ok=True)
    try:
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(os.path.join(os.path.abspath(path), "params"),
                       _as_numpy_tree(params), force=True)
            if opt_state is not None:
                ckptr.save(os.path.join(os.path.abspath(path), "opt_state"),
                           _as_numpy_tree(opt_state), force=True)
        backend = "orbax"
    except Exception:  # orbax unavailable/failed → flat npz fallback
        flat, treedef = jax.tree_util.tree_flatten(_as_numpy_tree(params))
        np.savez(os.path.join(path, "params.npz"),
                 **{str(i): a for i, a in enumerate(flat)})
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))
        backend = "npz"
    meta = {"step": step, "backend": backend, **(metadata or {})}
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, like_params: Any = None) -> Any:
    """Restore the params pytree saved by save_checkpoint."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if meta["backend"] == "orbax":
        import orbax.checkpoint as ocp
        with ocp.PyTreeCheckpointer() as ckptr:
            return ckptr.restore(os.path.join(os.path.abspath(path), "params"))
    data = np.load(os.path.join(path, "params.npz"))
    flat = [data[str(i)] for i in range(len(data.files))]
    if like_params is None:
        raise ValueError("npz restore requires like_params for the tree structure")
    treedef = jax.tree_util.tree_structure(like_params)
    return jax.tree_util.tree_unflatten(treedef, flat)


def prune_checkpoints(root: str, keep: int):
    """Keep the `keep` newest step dirs (numeric names), delete the rest."""
    if not os.path.isdir(root) or keep <= 0:
        return
    steps = sorted((int(d) for d in os.listdir(root) if d.isdigit()))
    for s in steps[:-keep]:
        shutil.rmtree(os.path.join(root, str(s)), ignore_errors=True)
