"""Checkpointing (SURVEY.md §5.4).

The reference persists nothing — every component has only ``reset()``
(reference trust_engine.py:37, session_logger.py:25, ...). The TPU build
adds model-side persistence: trained CNN / ensemble params, the calibration
temperature, and metadata, saved via orbax (with a NumPy ``.npz`` fallback so
checkpoints also work in orbax-less environments). Trust state remains
reset-on-demand by design — it is per-connection, seconds-lived state.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "DEFAULT_CKPT_DIR"]

DEFAULT_CKPT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "checkpoints")


def _flatten(tree: Any) -> tuple[dict[str, np.ndarray], Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}, treedef


def save_checkpoint(path: str, params: Any, metadata: dict | None = None) -> str:
    """Save a params pytree + JSON metadata. Uses orbax when importable,
    portable .npz otherwise. Returns the directory written."""
    os.makedirs(path, exist_ok=True)
    meta = dict(metadata or {})
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        ckpt.save(os.path.join(os.path.abspath(path), "params"), params, force=True)
        ckpt.wait_until_finished()
        meta["format"] = "orbax"
    except Exception:
        arrays, treedef = _flatten(params)
        np.savez(os.path.join(path, "params.npz"), **arrays)
        meta["format"] = "npz"
        meta["treedef"] = str(treedef)
    with open(os.path.join(path, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def restore_checkpoint(path: str, template: Any) -> tuple[Any, dict]:
    """Restore a params pytree saved by :func:`save_checkpoint`. ``template``
    is a pytree with the right structure/shapes (e.g. from ``model.init``)."""
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    if meta.get("format") == "orbax":
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        params = ckpt.restore(os.path.join(os.path.abspath(path), "params"), abstract)
        return params, meta
    data = np.load(os.path.join(path, "params.npz"))
    leaves, treedef = jax.tree_util.tree_flatten(template)
    restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, restored), meta
