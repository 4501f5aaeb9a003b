"""Rollout trace recording: compact on-disk capture of batched runs.

The engine's flight recorder — the observability piece the reference lacks
entirely (its record is printf + live RViz). Traces capture whatever pytree
of per-tick arrays a rollout emits, save to a single compressed .npz with a
JSON manifest of the tree structure, and reload as the same pytree — the
artifact for parity regression, post-hoc plotting (utils/viz.py), or
cross-round comparisons.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_trace(path: str, tree, meta: dict | None = None) -> str:
    """Save a pytree of arrays to `path` (.npz) with structure manifest."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__manifest__"] = np.frombuffer(
        json.dumps({"treedef": str(treedef),
                    "n_leaves": len(leaves),
                    "meta": meta or {}}).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)
    return path


def load_trace(path: str, like=None):
    """Load arrays back. With `like` (a pytree of the same structure), the
    arrays are unflattened into that structure; otherwise returns
    (list_of_arrays, meta)."""
    data = np.load(path)
    manifest = json.loads(bytes(data["__manifest__"]).decode())
    leaves = [data[f"leaf_{i}"] for i in range(manifest["n_leaves"])]
    if like is not None:
        treedef = jax.tree.structure(like)
        return jax.tree.unflatten(treedef, leaves), manifest["meta"]
    return leaves, manifest["meta"]


def compare_traces(a, b, atol: float = 1e-5) -> dict:
    """Leaf-wise max-abs differences between two same-structure traces —
    the golden-trace regression primitive."""
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    diffs = {}
    for i, (x, y) in enumerate(zip(la, lb)):
        diffs[f"leaf_{i}"] = float(np.max(np.abs(np.asarray(x)
                                                 - np.asarray(y))))
    diffs["max"] = max(diffs.values()) if diffs else 0.0
    diffs["within_tol"] = diffs["max"] <= atol
    return diffs
