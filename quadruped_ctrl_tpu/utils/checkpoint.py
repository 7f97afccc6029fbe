"""Checkpoint / resume for controller + simulator state pytrees.

The reference has no state serialization anywhere (reset re-creates the
controller, SURVEY.md §5); for long batched sweeps this saves/restores the
full (controller, sim) pytree as an .npz, preserving tree structure.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def save(path: str, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(p, n_leaves=len(leaves), **arrays)


def load(path: str, example_tree):
    """Restore into the structure of `example_tree` (shapes must match)."""
    data = np.load(path)
    n = int(data["n_leaves"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    treedef = jax.tree.structure(example_tree)
    example_leaves = jax.tree.leaves(example_tree)
    assert len(leaves) == len(example_leaves), "checkpoint/tree leaf mismatch"
    leaves = [
        l.astype(e.dtype) if hasattr(e, "dtype") else l
        for l, e in zip(leaves, example_leaves)
    ]
    return jax.tree.unflatten(treedef, leaves)
