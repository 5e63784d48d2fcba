"""Corruption sweeps: the 15-corruptions x 5-severities evaluation grid,
single-chip or sharded over a mesh.

This is the TPU build's replacement for the reference's UI-slider fault
injection (reference vision_simulator.py:25-36, app.js:1119-1163): corruption
becomes *data* — every (corruption, severity) cell runs the real model and
scores failure detection (SURVEY.md §5.3). The grid is embarrassingly
parallel; images shard over the mesh's data axis and XLA emits the psum for
cross-device metric reductions. One jitted program per corruption name
(severity is static, so each (name, severity) pair compiles once and is
cached).

Outputs per cell: accuracy, mean confidence, mean entropy, failure-detection
AUROC (uncertainty ranks misclassifications), and the anomaly scalar the
trust engine consumes.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fav_tpu.models.calibration import (
    aupr,
    auroc,
    brier_score,
    expected_calibration_error,
    failure_labels,
    fpr_at_95_tpr,
)
from fav_tpu.models.uncertainty import anomaly_from_confidence
from fav_tpu.ops.corruptions import CORRUPTION_NAMES, SEVERITIES, corruption_fn

__all__ = ["corruption_sweep", "fused_sweep", "sharded_sweep", "sweep_cell"]


@functools.partial(jax.jit, static_argnums=(0, 1, 6))
def sweep_cell(
    name: str,
    apply_fn: Callable,
    params: Any,
    images: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    severity: int,
    temperature: jax.Array | float = 1.0,
) -> dict[str, jax.Array]:
    """One (corruption, severity) cell: corrupt -> forward -> score.

    The corruption and the forward pass fuse into one XLA program — corrupted
    images never round-trip to HBM as a separate materialized dataset the way
    CIFAR-10-C ships as files.
    """
    corrupted = corruption_fn(name)(key, images, severity)
    logits = apply_fn(params, corrupted)
    return _cell_metrics(logits, labels, temperature)


def _cell_metrics(logits, labels, temperature):
    probs = jax.nn.softmax(logits / temperature, axis=-1)
    conf = jnp.max(probs, axis=-1)
    preds = jnp.argmax(probs, axis=-1)
    fails = failure_labels(preds, labels)
    logp = jnp.log(jnp.where(probs > 0, probs, 1.0))
    entropy = -jnp.sum(probs * logp, axis=-1)
    correct = (preds == labels).astype(jnp.float32)
    return {
        "accuracy": jnp.mean(correct),
        "mean_confidence": jnp.mean(conf),
        "mean_entropy": jnp.mean(entropy),
        "failure_rate": jnp.mean(fails.astype(jnp.float32)),
        "auroc": auroc(1.0 - conf, fails),
        "aupr": aupr(1.0 - conf, fails),
        "fpr_at_95": fpr_at_95_tpr(1.0 - conf, fails),
        # calibration *under shift*: the reference defines failure as a
        # high-confidence wrong prediction (reference README.md:22-24), so
        # whether the clean-fit temperature still calibrates at severity 5
        # is the core quality claim — measured per cell, not just clean
        "ece": expected_calibration_error(conf, correct),
        "brier": brier_score(probs, labels),
        "mean_anomaly": jnp.mean(anomaly_from_confidence(conf)),
    }


@functools.partial(jax.jit, static_argnums=(0, 1, 7))
def _fused_grid(cells, apply_fn, params, images, labels, key, temperature, base):
    """A chunk of (corruption, severity) cells in ONE XLA program. ``cells``
    is a static tuple of (name, severity); per-cell keys are
    ``fold_in(key, base + i)`` — absolute grid index, so chunking never
    changes any cell's corruption draw."""
    stacked: dict[str, list] = {}
    for i, (name, sev) in enumerate(cells):
        k = jax.random.fold_in(key, base + i)
        corrupted = corruption_fn(name)(k, images, sev)
        logits = apply_fn(params, corrupted)
        for m, v in _cell_metrics(logits, labels, temperature).items():
            stacked.setdefault(m, []).append(v)
    return {m: jnp.stack(vs) for m, vs in stacked.items()}


def fused_sweep(
    apply_fn: Callable,
    params: Any,
    images: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    corruptions: Sequence[str] = CORRUPTION_NAMES,
    severities: Sequence[int] = SEVERITIES,
    temperature: jax.Array | float = 1.0,
    cells_per_call: int = 0,
) -> dict[str, dict[int, dict[str, float]]]:
    """Full grid as ONE compiled program + ONE dispatch (or a few, chunked).

    The per-cell path pays ~10 ms dispatch plus a host scalar fetch per
    metric per cell over the TPU tunnel — at 75 cells that dominates the
    wall clock (the same lesson as bench.py's megastep). Fusing brings a
    full-grid evaluation from ~25 min to the compute cost of 75 batched
    forwards. Works unchanged on sharded inputs (metrics are scalar psums).

    ``cells_per_call`` bounds the program size: multi-forward scorers
    (M-member ensembles, K-replica MC-dropout) at 2048 images blow the HBM
    liveness budget in a single 75-cell program (measured: 43 GB demanded
    of 15.75 GB for a 5-member ensemble). 0 = all cells in one program.
    Chunking never changes results — cell keys fold in the absolute index.
    """
    cells = tuple((str(n), int(s)) for n in corruptions for s in severities)
    step = cells_per_call or len(cells)
    host: dict[str, list] = {}
    for start in range(0, len(cells), step):
        chunk = cells[start : start + step]
        out = _fused_grid(
            chunk, apply_fn, params, images, labels, key, temperature, start
        )
        for m, v in jax.device_get(out).items():  # one D2H per chunk
            host.setdefault(m, []).extend(v.tolist())
    results: dict[str, dict[int, dict[str, float]]] = {}
    for i, (name, sev) in enumerate(cells):
        results.setdefault(name, {})[sev] = {m: host[m][i] for m in host}
    return results


def corruption_sweep(
    apply_fn: Callable,
    params: Any,
    images: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    corruptions: Sequence[str] = CORRUPTION_NAMES,
    severities: Sequence[int] = SEVERITIES,
    temperature: jax.Array | float = 1.0,
) -> dict[str, dict[int, dict[str, float]]]:
    """Full grid on the current default device/sharding. Returns
    ``{corruption: {severity: metrics}}`` as host floats.

    Cell keys are ``fold_in(key, absolute_cell_index)`` — the SAME derivation
    as :func:`fused_sweep`, so the per-cell debugging path reproduces the
    fused path cell-for-cell (bitwise-identical corruption draws), not just
    statistically."""
    cells = [(name, sev) for name in corruptions for sev in severities]
    results: dict[str, dict[int, dict[str, float]]] = {}
    for i, (name, sev) in enumerate(cells):
        k = jax.random.fold_in(key, i)
        cell = sweep_cell(name, apply_fn, params, images, labels, k, sev, temperature)
        results.setdefault(name, {})[sev] = {m: float(v) for m, v in cell.items()}
    return results


def sharded_sweep(
    mesh: Mesh,
    apply_fn: Callable,
    params: Any,
    images: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    corruptions: Sequence[str] = CORRUPTION_NAMES,
    severities: Sequence[int] = SEVERITIES,
    temperature: jax.Array | float = 1.0,
    fused: bool = False,
    cells_per_call: int = 0,
) -> dict[str, dict[int, dict[str, float]]]:
    """Same grid with images/labels sharded over the mesh's data axis and
    params replicated. The per-cell jitted program is unchanged — XLA inserts
    the ICI collectives for the scalar reductions (SURVEY.md §5.8).
    ``fused=True`` runs the whole grid as one program (:func:`fused_sweep`).

    On a multi-slice mesh (built by :func:`fav_tpu.parallel.mesh.
    build_multislice_mesh`, axes ``(dcn, data, ensemble, model)``) the batch
    shards hierarchically over ``("dcn", "data")``: per-image work stays on
    ICI inside each slice; only the scalar metric psums cross the DCN."""
    if "dcn" in mesh.axis_names:
        batch_axes: tuple | str = ("dcn", "data")
    else:
        batch_axes = "data"
    img_sh = NamedSharding(mesh, P(batch_axes, None, None, None))
    lbl_sh = NamedSharding(mesh, P(batch_axes))
    rep = NamedSharding(mesh, P())
    images = jax.device_put(images, img_sh)
    labels = jax.device_put(labels, lbl_sh)
    params = jax.device_put(params, rep)
    if fused:
        return fused_sweep(
            apply_fn, params, images, labels, key, corruptions, severities,
            temperature, cells_per_call,
        )
    return corruption_sweep(
        apply_fn, params, images, labels, key, corruptions, severities, temperature
    )
