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
    "data_sharding",
    "ensemble_sharding",
    "replicate",
    "auto_mesh_shape",
]

AXES = ("data", "ensemble", "model")


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


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Batch axis over the data dimension; everything else replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def ensemble_sharding(mesh: Mesh) -> NamedSharding:
    """Leading member axis over the ensemble dimension (params pytrees:
    apply leaf-wise with `jax.tree.map`)."""
    return NamedSharding(mesh, P("ensemble"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_for_ensemble(mesh: Mesh, stacked_params):
    """Place a stacked-params pytree with the member axis on the ensemble
    mesh axis (member-per-device when sizes match)."""
    sh = NamedSharding(mesh, P("ensemble"))

    def place(leaf):
        spec = P(*(("ensemble",) + (None,) * (leaf.ndim - 1)))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    del sh
    return jax.tree.map(place, stacked_params)
