"""Checkpoint / resume for env-state pytrees and learner params.

The reference has no env checkpointing at all (SURVEY.md §5; only the SB3
``model.save`` in its training script).  Here it is trivial by construction:
every env state is a pytree of arrays, so one snapshot of (states, params,
opt_state, key) resumes a sharded rollout bit-exactly.

Uses orbax when available, with a plain ``np.savez`` fallback that handles
any pytree of arrays (structure is pickled alongside).
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    """Snapshot a pytree of arrays to ``path`` (directory or .npz stem)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        *[np.asarray(leaf) for leaf in leaves],
    )
    with open(_treedef_path(path), "wb") as f:
        pickle.dump(treedef, f)


def load_pytree(path: str) -> Any:
    """Restore a pytree saved with :func:`save_pytree`."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    # savez names leaves arr_0..arr_N; data.files order is not contractual,
    # so sort by the numeric index explicitly before unflattening.
    leaves = [data[k] for k in sorted(data.files, key=lambda k: int(k[4:]))]
    with open(_treedef_path(path), "rb") as f:
        treedef = pickle.load(f)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _treedef_path(path: str) -> str:
    stem = path[: -len(".npz")] if path.endswith(".npz") else path
    return stem + ".treedef.pkl"


def save_orbax(path: str, tree: Any) -> bool:
    """Orbax snapshot (multi-host safe); returns False if orbax is absent."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return False
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.abspath(path), tree, force=True)
    return True


def load_orbax(path: str, target: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    return ckpt.restore(os.path.abspath(path), item=target)
