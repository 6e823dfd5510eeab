"""Checkpoint / resume for models, optimizers and campaigns.

The reference persists only per-study result JSONs with no model-level state
(SURVEY.md section 5 "Checkpoint/resume: none").  Here any parameter pytree —
a fitted ``SourceStack``, a ``ScaMLGP`` state, campaign buffers — serializes
to one ``.npz`` plus a structure descriptor, and the BO driver exposes
``save_state`` / ``load_state`` so long campaigns survive pre-emption.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List

import jax
import numpy as np


def save_pytree(path, tree: Any) -> None:
    """Serialize an arbitrary array pytree to ``<path>.npz`` + treedef json.

    Writes are atomic (temp file + ``os.replace``): checkpoints are taken
    under pre-emption/timeout kills, and a truncated ``.npz`` would
    otherwise poison every subsequent resume attempt."""
    import os

    path = Path(path)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    path.parent.mkdir(parents=True, exist_ok=True)
    # temp name must end in ".npz" or np.savez appends the suffix itself
    tmp = str(path) + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, str(path) + ".npz")
    tmp_tree = str(path) + ".tree.json.tmp"
    with open(tmp_tree, "w") as fh:
        json.dump({"treedef": str(treedef), "num_leaves": len(leaves)}, fh)
    os.replace(tmp_tree, str(path) + ".tree.json")


def load_leaves(path) -> List[np.ndarray]:
    """Load the flat leaves; caller restores structure with
    ``jax.tree_util.tree_unflatten`` against a template, via
    ``load_pytree_like``."""
    with np.load(str(path) + ".npz") as data:
        return [data[f"leaf_{i}"] for i in range(len(data.files))]


def load_pytree_like(path, template: Any) -> Any:
    """Restore a pytree with the same structure as ``template``.

    Every loaded leaf must match the template leaf's shape and dtype — a
    mismatch means the checkpoint was written with different settings
    (studies/evals/dtype/mesh padding) and would otherwise fail deep inside
    jit with cryptic errors or slice silently."""
    leaves = load_leaves(path)
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            f"Checkpoint at {path} has {len(leaves)} leaves, template has "
            f"{len(t_leaves)}")
    for i, (l, t) in enumerate(zip(leaves, t_leaves)):
        t_arr = np.asarray(t)
        if l.shape != t_arr.shape or l.dtype != t_arr.dtype:
            raise ValueError(
                f"Checkpoint at {path} was saved with different settings: "
                f"leaf {i} has shape {l.shape} dtype {l.dtype}, expected "
                f"shape {t_arr.shape} dtype {t_arr.dtype} (check "
                f"--studies/--evals/dtype/mesh padding)")
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(l) for l in leaves])


def save_optimizer_state(path, optimizer) -> None:
    """Persist a ``ScaMLGPBO``'s resumable state: observed data + the fitted
    target parameters + source stack."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    meta: Dict[str, Any] = {
        "X": [x.tolist() for x in optimizer.X],
        "losses": [None if not np.isfinite(l) else float(l)
                   for l in optimizer.losses],
        "num_generated": optimizer._num_generated,
        "pending": optimizer._pending,
        "key": np.asarray(optimizer._key).tolist(),
    }
    with open(path / "driver.json", "w") as fh:
        json.dump(meta, fh)
    save_pytree(path / "source_stack", optimizer.source_gps)
    save_pytree(path / "target_params", optimizer.model.params)


def load_optimizer_state(path, optimizer) -> None:
    """Restore state saved by ``save_optimizer_state`` into a freshly
    constructed optimizer (same search space / meta data shapes)."""
    import jax.numpy as jnp

    path = Path(path)
    with open(path / "driver.json") as fh:
        meta = json.load(fh)
    optimizer.X = [np.asarray(x) for x in meta["X"]]
    optimizer.losses = [np.nan if l is None else float(l)
                        for l in meta["losses"]]
    optimizer._num_generated = meta["num_generated"]
    optimizer._pending = meta["pending"]
    optimizer._key = jnp.asarray(np.asarray(meta["key"], np.uint32))
    optimizer.source_gps = load_pytree_like(path / "source_stack",
                                            optimizer.source_gps)
    params = load_pytree_like(path / "target_params",
                              optimizer.model.params)
    # same canonical ordering as ScaMLGPBO.report so the rebuilt model is
    # bit-identical to the pre-checkpoint one
    order = sorted(range(len(optimizer.X)),
                   key=lambda i: (optimizer.X[i].tobytes(),
                                  optimizer.losses[i]))
    X = (np.stack([optimizer.X[i] for i in order]) if optimizer.X
         else np.zeros((0, optimizer._n_features)))
    y = np.asarray([optimizer.losses[i] for i in order])
    keep = np.isfinite(y) if len(y) else np.zeros(0, bool)
    optimizer.model = optimizer._build_model(
        X[keep] if len(y) else X, y[keep] if len(y) else y, params=params)
