"""Device-mesh construction and sharding rules.

The reference has **no** parallelism or communication backend — one asyncio
process plus a capture thread (reference main.py:208, video_source.py:88-89;
SURVEY.md §2.5). The TPU build scales through *sharding, not threads*: a
named `jax.sharding.Mesh` with three axes

    data      — batch/corruption-grid parallelism (embarrassingly parallel)
    ensemble  — deep-ensemble members / MC-dropout replicas, member-per-device
    model     — reserved tensor-parallel axis (unused by the small CNN, kept
                so larger backbones shard without API change)

All communication is XLA-emitted collectives over ICI (psum for ensemble
means and loss reductions); there is no hand-written NCCL/MPI analog to port.
`jax.jit` with `NamedSharding` in/out specs drives everything; kernels are
sharding-oblivious.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fav_tpu.config import MeshParams

__all__ = [
    "build_mesh",
    "build_multislice_mesh",
    "data_sharding",
    "hierarchical_data_sharding",
    "ensemble_sharding",
    "replicate",
    "auto_mesh_shape",
]

AXES = ("data", "ensemble", "model")
DCN_AXIS = "dcn"  # outermost multi-slice axis; collectives crossing it ride
#                   the data-center network, everything else stays on ICI


def auto_mesh_shape(n_devices: int, ensemble_size: int = 1) -> tuple[int, int, int]:
    """Pick (data, ensemble, model) sizes for n devices: give the ensemble
    axis the largest divisor of n that divides ensemble_size (member-per-
    device when possible), the rest to data. Model axis stays 1 for the CNN."""
    ens = math.gcd(n_devices, ensemble_size) if ensemble_size > 1 else 1
    return (n_devices // ens, ens, 1)


def build_mesh(
    shape: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
    params: MeshParams | None = None,
) -> Mesh:
    """Build the named mesh. Default: all visible devices on the data axis."""
    p = params or MeshParams()
    devs = list(devices) if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devs), 1, 1)
    if int(np.prod(shape)) != len(devs):
        raise ValueError(f"mesh shape {tuple(shape)} != {len(devs)} devices")
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, (p.data_axis, p.ensemble_axis, p.model_axis))


def build_multislice_mesh(
    n_slices: int,
    per_slice_shape: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
    params: MeshParams | None = None,
) -> Mesh:
    """4-axis mesh ``(dcn, data, ensemble, model)`` for multi-slice sweeps
    (SURVEY.md §2.5/§5.8: "DCN only if multi-slice sweeps are ever needed").

    The outermost ``dcn`` axis maps to slice boundaries — pass ``devices``
    grouped by slice (on real multi-slice hardware: ``jax.devices()`` sorted
    by ``d.slice_index``). The corruption grid shards its batch
    hierarchically over ``("dcn", "data")`` so per-image work never crosses
    slices; only the O(1) scalar metric psums ride the DCN, which is the
    right traffic shape for a bandwidth-tiered interconnect.
    """
    p = params or MeshParams()
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) % n_slices:
        raise ValueError(f"{len(devs)} devices do not split into {n_slices} slices")
    per = len(devs) // n_slices
    if per_slice_shape is None:
        per_slice_shape = (per, 1, 1)
    if int(np.prod(per_slice_shape)) != per:
        raise ValueError(f"per-slice shape {tuple(per_slice_shape)} != {per} devices/slice")
    arr = np.asarray(devs).reshape((n_slices, *per_slice_shape))
    return Mesh(arr, (DCN_AXIS, p.data_axis, p.ensemble_axis, p.model_axis))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch axis over the data dimension; everything else replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def hierarchical_data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch over (dcn, data) jointly — per-slice data parallelism with the
    slice axis outermost (multi-slice meshes only)."""
    return NamedSharding(mesh, P((DCN_AXIS, "data"), *([None] * (ndim - 1))))


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    """Leading member axis over the ensemble dimension (params pytrees:
    apply leaf-wise with `jax.tree.map`)."""
    return NamedSharding(mesh, P("ensemble"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_for_ensemble(mesh: Mesh, stacked_params):
    """Place a stacked-params pytree with the member axis on the ensemble
    mesh axis (member-per-device when sizes match)."""
    def place(leaf):
        spec = P(*(("ensemble",) + (None,) * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(place, stacked_params)
