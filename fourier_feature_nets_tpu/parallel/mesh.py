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
           "replicated_sharding", "put_replicated",
           "initialize_distributed"]

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


def put_replicated(tree, mesh: Mesh):
    """Replicates host-identical values onto every device of the mesh,
    in both single- and multi-process environments.

    Single-process ``device_put`` cannot target a sharding that spans
    non-addressable devices; on a multi-host mesh each process instead
    contributes its local copy via
    ``jax.make_array_from_process_local_data`` (the values must be
    identical across hosts — true for params, optimizer state, the
    epoch permutation and the sampler/dataset tables, which every host
    derives from the same seed/files). Addressability comes from the
    sharding itself, not ``jax.process_count()``: the latter consults
    the DEFAULT backend, which may be a different (single-process)
    platform than the mesh's."""
    sharding = replicated_sharding(mesh)
    if sharding.is_fully_addressable:
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_count: Optional[int] = None
                           ) -> bool:
    """Multi-host bootstrap (SURVEY.md §2.2 DCN mandate).

    The TPU-native replacement for a NCCL/MPI bootstrap: JAX's
    coordination service wires hosts over DCN
    (``jax.distributed.initialize``), after which ``jax.devices()``
    is the GLOBAL device list and all device-level communication is
    XLA collectives (ICI within a slice, DCN across hosts).

    Must be called before any other JAX API touches a backend.

    Args:
        coordinator_address: ``host:port`` of process 0. Defaults to
            ``$COORDINATOR_ADDRESS``; when neither is set this is a
            no-op (single-process run) returning False.
        num_processes / process_id: explicit topology; defaults come
            from the environment (``JAX_NUM_PROCESSES`` /
            ``JAX_PROCESS_ID``, or the TPU metadata on Cloud TPU).
        local_device_count: optionally force this many virtual CPU
            devices per process (test rigs; appends to XLA_FLAGS).

    Returns:
        True when the distributed runtime was initialized.
    """
    import os
    if local_device_count:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count"
              f"={local_device_count}")
    coordinator_address = (coordinator_address
                          or os.environ.get("COORDINATOR_ADDRESS"))
    if coordinator_address is None:
        return False
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True
