"""Checkpoint / resume of solver state.

The reference has no checkpointing at all (SURVEY.md §5.4); long multi-host
runs need it.  A `Problem` (or any pytree of arrays) round-trips through a
single `.npz` plus a pytree-structure descriptor; `save`/`load` are
structure-exact so a resumed solve continues bit-identically.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save(path: str, pytree, extra: dict | None = None) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        json.dumps({"repr": str(treedef),
                    "extra": extra or {}}).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load(path: str, like):
    """Restore into the structure of `like` (structure/shapes must match)."""
    data = np.load(path)
    leaves_like, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves_like)
    n_saved = sum(1 for k in data.files if k.startswith("leaf_"))
    saved_repr = json.loads(
        bytes(data["__treedef__"]).decode()).get("repr", "?")
    if n_saved != n:
        raise ValueError(
            f"checkpoint structure mismatch: {n_saved} saved leaves vs "
            f"{n} in the target structure.\n  saved treedef:  "
            f"{saved_repr}\n  target treedef: {treedef}")
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    for i, (a, b) in enumerate(zip(leaves, leaves_like)):
        if a.shape != np.asarray(b).shape:
            raise ValueError(
                f"checkpoint shape mismatch at leaf {i}: {a.shape} vs "
                f"{np.asarray(b).shape} (saved treedef: {saved_repr})")
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(a) for a in leaves])


def extra(path: str) -> dict:
    data = np.load(path)
    meta = json.loads(bytes(data["__treedef__"]).decode())
    return meta.get("extra", {})
