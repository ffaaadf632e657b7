"""Checkpointing with the reference's file semantics.

Reference (utils/model.py:101-136): ``latest_checkpoint``, ``best_auc_model``,
``best_ap_model`` files containing ``{epoch, model, optimizer, best_auc,
best_ap}``; resume restores all of it.  We serialize JAX pytrees with
msgpack-free numpy ``.npz`` plus a JSON manifest of the tree structure
(orbax is available but a flat-npz format keeps checkpoints portable and
dependency-light; the layout is stable for the torch->JAX converter).
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[Dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    return arrays, treedef


def save_pytree(path: Path, tree, extra: Optional[dict] = None):
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays, _ = _flatten(tree)
    np.savez(path, **arrays)
    if extra is not None:
        with open(path.with_suffix(".json"), "w") as f:
            json.dump(extra, f)


def load_pytree(path: Path, like):
    """Restores arrays into the structure of ``like``."""
    path = Path(path)
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree.flatten(like)
    n = len(leaves)
    new_leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        ref = leaves[i]
        if hasattr(ref, "shape") and tuple(ref.shape) != tuple(arr.shape):
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != model "
                f"{tuple(ref.shape)}")
        new_leaves.append(arr)
    return jax.tree.unflatten(treedef, new_leaves)


def load_extra(path: Path) -> dict:
    p = Path(path).with_suffix(".json")
    if p.exists():
        with open(p) as f:
            return json.load(f)
    return {}


def save_checkpoint(model_dir: Path, tree, epoch: int, best_auc: float,
                    best_ap: float, is_best_auc: bool, is_best_ap: bool):
    """reference utils/model.py:101-136 file naming."""
    model_dir = Path(model_dir)
    extra = dict(epoch=epoch, best_auc=float(best_auc),
                 best_ap=float(best_ap))
    save_pytree(model_dir / "latest_checkpoint.npz", tree, extra)
    if is_best_auc:
        save_pytree(model_dir / "best_auc_model.npz", tree, extra)
    if is_best_ap:
        save_pytree(model_dir / "best_ap_model.npz", tree, extra)


def find_best_checkpoint(output_dir: str, experiment_name: str,
                         explicit: str = "") -> Path:
    """reference utils/utils.py:95-133 search order: explicit path, else the
    newest experiment dir, best_ap -> best_auc -> latest."""
    if explicit:
        return Path(explicit)
    model_dir = Path(output_dir) / "models"
    if not model_dir.exists():
        raise FileNotFoundError(f"Model directory does not exist: {model_dir}")
    exps = sorted(model_dir.glob(f"{experiment_name}_*"), reverse=True)
    if not exps:
        raise FileNotFoundError(
            f"No directories matching experiment name: {experiment_name}")
    latest = exps[0]
    for name in ("best_ap_model.npz", "best_auc_model.npz",
                 "latest_checkpoint.npz"):
        if (latest / name).exists():
            return latest / name
    raise FileNotFoundError(f"No checkpoints in {latest}")
