"""Mesh parallelism: device-mesh construction, sharded corruption sweeps,
ensemble sharding, and sharded training steps (SURVEY.md §2.5, §5.8)."""

from fav_tpu.parallel.mesh import (  # noqa: F401
    build_mesh,
    data_sharding,
    ensemble_sharding,
    replicate,
)
from fav_tpu.parallel.sweep import corruption_sweep, sharded_sweep  # noqa: F401
