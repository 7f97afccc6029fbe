"""Checkpoint / resume for controller + simulator state pytrees.

The reference has no state serialization anywhere (reset re-creates the
controller, SURVEY.md §5); for long batched sweeps this saves/restores the
full (controller, sim) pytree as an .npz, preserving tree structure. A
`fingerprint` (any JSON-able dict of run parameters) can be stored alongside
the tree; `load` refuses a checkpoint whose fingerprint does not match, so a
sweep cannot silently resume against different seeds/terrains/configs.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def save(path: str, tree, fingerprint: dict | None = None) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    if fingerprint is not None:
        arrays["fingerprint"] = np.frombuffer(
            json.dumps(fingerprint, sort_keys=True).encode(), dtype=np.uint8
        )
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(p, n_leaves=len(leaves), **arrays)


def load(path: str, example_tree, fingerprint: dict | None = None):
    """Restore into the structure of `example_tree`.

    Raises ValueError on leaf-count or shape mismatch (a stale or foreign
    checkpoint), and on fingerprint mismatch when one is supplied both here
    and in the file.
    """
    data = np.load(path)
    if fingerprint is not None and "fingerprint" in data:
        stored = json.loads(bytes(data["fingerprint"]).decode())
        want = json.loads(json.dumps(fingerprint, sort_keys=True))
        if stored != want:
            raise ValueError(
                f"checkpoint {path} was written by a different run: "
                f"stored fingerprint {stored} != requested {want}"
            )
    elif fingerprint is not None:
        # legacy checkpoint written before fingerprints existed: it cannot
        # be validated against the requested run parameters. Surface that
        # loudly; a structural mismatch (e.g. a leaf added since) still
        # raises below, and such checkpoints should be discarded.
        import warnings

        warnings.warn(
            f"checkpoint {path} has no stored fingerprint (pre-fingerprint "
            "revision); run-parameter validation skipped — discard it if the "
            "sweep parameters may have changed",
            stacklevel=2,
        )
    n = int(data["n_leaves"])
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    example_leaves = jax.tree.leaves(example_tree)
    if len(leaves) != len(example_leaves):
        raise ValueError(
            f"checkpoint {path} has {len(leaves)} leaves, expected "
            f"{len(example_leaves)}"
        )
    for i, (l, e) in enumerate(zip(leaves, example_leaves)):
        if hasattr(e, "shape") and tuple(l.shape) != tuple(e.shape):
            raise ValueError(
                f"checkpoint {path} leaf {i} has shape {tuple(l.shape)}, "
                f"expected {tuple(e.shape)}"
            )
    leaves = [
        l.astype(e.dtype) if hasattr(e, "dtype") else l
        for l, e in zip(leaves, example_leaves)
    ]
    treedef = jax.tree.structure(example_tree)
    return jax.tree.unflatten(treedef, leaves)
