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


# npz fallback: flatten trees of dicts/lists/tuples to path-keyed arrays so
# restore needs no structural template. List indices are tagged '#i'.
def _flatten_paths(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for key in tree:
            out.update(_flatten_paths(tree[key], f"{prefix}{key}/"))
    elif isinstance(tree, (list, tuple)):
        for i, item in enumerate(tree):
            out.update(_flatten_paths(item, f"{prefix}#{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_paths(flat):
    root: dict = {}
    for path, value in flat.items():
        node = root
        parts = path.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def rebuild(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return [rebuild(node[f"#{i}"]) for i in range(len(node))]
        return {k: rebuild(v) for k, v in node.items()}

    return rebuild(root)


# np.savez cannot represent ml_dtypes (bfloat16 round-trips as void '|V2',
# making the checkpoint UNLOADABLE — reproduced). Store such leaves as
# float32 with a '.dtype' sidecar key and cast back on load (bf16->fp32 is
# exact, fp32->bf16 restores the original bits).
_NPZ_NATIVE = set("?bhilqpBHILQPefdgFDG")


def _to_npz_safe(flat):
    out = {}
    for k, v in flat.items():
        if v.dtype.char not in _NPZ_NATIVE:
            out[k] = v.astype(np.float32)
            out[k + ".dtype"] = np.array(str(v.dtype))
        else:
            out[k] = v
    return out


def _from_npz_safe(data):
    import ml_dtypes  # jax dependency; provides bfloat16 et al.
    flat = {}
    for k in data:
        if k.endswith(".dtype"):
            continue
        v = data[k]
        if k + ".dtype" in data:
            v = v.astype(np.dtype(str(data[k + ".dtype"])))
        flat[k] = v
    return flat


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
    except Exception:  # orbax unavailable/failed → path-keyed npz fallback
        np.savez(os.path.join(path, "params.npz"),
                 **_to_npz_safe(_flatten_paths(_as_numpy_tree(params))))
        if opt_state is not None:
            # the docstring promises opt state persists; silently dropping
            # it in the fallback broke that contract (review finding)
            np.savez(os.path.join(path, "opt_state.npz"),
                     **_to_npz_safe(_flatten_paths(_as_numpy_tree(opt_state))))
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
    del like_params  # path-keyed npz needs no structural template
    return _unflatten_paths(_from_npz_safe({k: data[k] for k in data.files}))


def prune_checkpoints(root: str, keep: int):
    """Keep the `keep` newest step dirs (numeric names), delete the rest."""
    if not os.path.isdir(root) or keep <= 0:
        return
    steps = sorted((int(d) for d in os.listdir(root) if d.isdigit()))
    for s in steps[:-keep]:
        shutil.rmtree(os.path.join(root, str(s)), ignore_errors=True)
