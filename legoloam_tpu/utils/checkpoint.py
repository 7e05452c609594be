"""Checkpoint / resume for the full SLAM state.

The reference has NO state persistence — the only artifact is a final PCD dump
on shutdown (``src/mapOptmization.cpp:730-755``); a crashed 20K-scan run
restarts from zero (SURVEY.md §5).  Here the whole ``SlamState`` is a pytree of
fixed-shape arrays, so checkpointing is one flat npz file: atomic save, exact
resume (bit-identical continuation thanks to the deterministic pipeline).
"""

from __future__ import annotations

import os
import tempfile
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        key = "/".join(str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_state(path: str, state: Any) -> None:
    """Atomic save of any pytree of arrays to ``path`` (npz)."""
    flat = _flatten_with_paths(state)
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_state(path: str, template: Any) -> Any:
    """Load a checkpoint into the structure of ``template`` (an initialized
    state with the same config — shapes must match)."""
    data = np.load(path)
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for p, leaf in leaves_with_paths:
        key = "/".join(str(x) for x in p)
        if key not in data:
            raise KeyError(f"checkpoint missing array {key!r}")
        arr = data[key]
        tmpl = np.asarray(leaf)
        if arr.shape != tmpl.shape:
            raise ValueError(
                f"checkpoint shape mismatch for {key!r}: "
                f"{arr.shape} vs {tmpl.shape} (config changed?)")
        new_leaves.append(jax.numpy.asarray(arr.astype(tmpl.dtype)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
