"""Device mesh helpers.

The framework's scale-out model (SURVEY.md §2.2): rays are
embarrassingly parallel, so training and rendering shard the ray-batch
axis across a 1-D ``jax.sharding.Mesh`` ("data"); parameters are
replicated and gradient all-reduce rides ICI via XLA collectives. No
NCCL/MPI analog exists or is needed — psum is the communication
backend. TP/PP/SP/EP have no counterpart in this workload (tiny MLPs,
no sequence axis); the per-ray sample axis stays on-chip.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "replicate", "shard_rays", "data_sharding",
           "replicated_sharding"]

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None,
              axis: str = DATA_AXIS) -> Mesh:
    """Creates a 1-D data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (ray-batch) axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Replicates a pytree onto every device of the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))


def shard_rays(array, mesh: Mesh, axis: str = DATA_AXIS):
    """Shards an array along its leading axis across the mesh."""
    return jax.device_put(array, NamedSharding(mesh, P(axis)))


def initialize_distributed():
    """Multi-host initialization (jax.distributed) when running on a
    multi-host TPU slice; a no-op in single-process environments.

    The TPU-native replacement for a NCCL/MPI bootstrap: JAX's
    coordination service wires hosts over DCN, and all device-level
    communication is XLA collectives over ICI.
    """
    import os
    if "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
