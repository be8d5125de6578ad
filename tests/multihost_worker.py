"""Worker process for the multi-process multi-host tests.

NOT a test module — launched by tests/test_multihost.py as
``python multihost_worker.py <process_id> <num_processes> <port>
<scene.npz> [mode] [local_devices]``. Each process brings up
``local_devices`` virtual CPU devices, joins the jax.distributed
coordination service (the DCN bootstrap, SURVEY.md §2.2) and builds
the GLOBAL mesh. Modes:

- ``collectives`` (default): data-parallel train steps through the
  explicit-collective shard_map path, an occupancy-guided sampler
  swap, and a cross-process table refresh.
- ``fit``: the PRODUCTION jit path — ``Raycaster.fit(mesh=...)``
  (GSPMD sharding-constraint step, scan-chunked, full validation
  protocol) under a multi-process global mesh.

Prints one final line ``RESULT <v1> <v2> ...`` for the parent to
cross-check bit-identity between processes.
"""

import os
import sys

process_id = int(sys.argv[1])
num_processes = int(sys.argv[2])
port = sys.argv[3]
scene_path = sys.argv[4]
mode = sys.argv[5] if len(sys.argv) > 5 else "collectives"
local_devices = int(sys.argv[6]) if len(sys.argv) > 6 else 4

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from fourier_feature_nets_tpu.parallel import (  # noqa: E402
    initialize_distributed,
    make_mesh,
    make_shard_map_train_step,
    put_replicated,
)

# must run before any backend is touched
assert initialize_distributed(f"localhost:{port}", num_processes,
                              process_id,
                              local_device_count=local_devices)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# the environment's TPU tunnel plugin registers itself regardless of
# JAX_PLATFORMS (CLAUDE.md) and becomes the default backend, so scope
# every device/process query to the CPU backend explicitly
assert jax.process_count("cpu") == num_processes, (
    jax.process_count("cpu"))
cpu_devices = jax.devices("cpu")
assert len(cpu_devices) == local_devices * num_processes, cpu_devices
assert len(jax.local_devices(backend="cpu")) == local_devices
jax.config.update("jax_default_device",
                  jax.local_devices(backend="cpu")[0])

import fourier_feature_nets_tpu as ffn  # noqa: E402
from fourier_feature_nets_tpu.models import Voxels  # noqa: E402
from fourier_feature_nets_tpu.render.occupancy_sampler import (  # noqa: E402
    OccupancyGridSampler,
    density_grid_from_model,
)
from fourier_feature_nets_tpu.render.ray_sampler import (  # noqa: E402
    RaySampler,
)
from fourier_feature_nets_tpu.utils import adam_init  # noqa: E402

# every host loads the same dataset file and derives identical tables
train = ffn.ImageDataset.load(scene_path, "train", num_samples=16,
                              stratified=True)

mesh = make_mesh(cpu_devices)  # GLOBAL mesh across all processes
assert mesh.devices.size == local_devices * num_processes

model = Voxels(side=8, scale=1.0)
params = model.init(jax.random.PRNGKey(0))
caster = ffn.Raycaster(model)

if mode == "fit":
    # production GSPMD path: the whole fit loop — scan-chunked jit
    # train step with a sharding constraint on the ray batch,
    # occupancy-guided phase, full validation protocol — under the
    # multi-process global mesh
    val = ffn.ImageDataset.load(scene_path, "val", num_samples=16,
                                stratified=True)
    params, log = caster.fit(params, train, val, batch_size=64,
                             learning_rate=0.01, num_steps=12,
                             crop_steps=4, report_interval=6,
                             decay_rate=0.9, decay_steps=25000,
                             mesh=mesh, seed=3, steps_per_call=2,
                             occupancy_interval=6, occupancy_samples=8,
                             occupancy_start=6)
    checks = [entry.val_psnr for entry in log]
    checks.append(float(np.mean(np.abs(
        np.asarray(jax.tree.leaves(params)[0], np.float64)))))
    print("RESULT " + " ".join(f"{v:.10f}" for v in checks))
    sys.exit(0)

batch = 64
step = make_shard_map_train_step(caster, train, batch, 0.01, 0.9,
                                 25000, 0.0, mesh)

pool = train.index_pool().astype(np.int32)
perm = np.asarray(jax.random.permutation(
    jax.random.PRNGKey(1), jnp.asarray(pool)))

# all step inputs replicate host-identical values onto the global mesh
p = put_replicated(params, mesh)
o = put_replicated(adam_init(params), mesh)
perm_g = put_replicated(jnp.asarray(perm), mesh)
zero = put_replicated(jnp.asarray(0, jnp.int32), mesh)
rng = put_replicated(jax.random.PRNGKey(2), mesh)

p, o, loss1 = step(p, o, perm_g, zero, zero, rng)
loss1 = float(loss1)  # fully replicated: readable on every process
assert np.isfinite(loss1)

# occupancy-guided swap: density grid from the live model, sampler
# shares the base per-ray tables, new step over the swapped dataset
params_host = jax.tree.map(np.asarray, p)
grid = density_grid_from_model(model, params_host, resolution=16,
                               scale=float(
                                   train.sampler.bounds_max[0]))
base_sampler = train.sampler
occ = OccupancyGridSampler(None, base_sampler.cameras, 8,
                           stratified=base_sampler.stratified,
                           bounds=base_sampler.bounds,
                           occupancy_grid=grid,
                           grid_scale=float(
                               base_sampler.bounds_max[0]))
base_sampler.ensure_ray_tables()
for name in RaySampler._RAY_TABLES:
    object.__setattr__(occ, name, getattr(base_sampler, name))
occ._ray_tables_ready = True
train.sampler = occ

occ_step = make_shard_map_train_step(caster, train, batch, 0.01, 0.9,
                                     25000, 0.0, mesh)
p, o, loss2 = occ_step(p, o, perm_g, zero,
                       put_replicated(jnp.asarray(1, jnp.int32), mesh),
                       rng)
loss2 = float(loss2)
assert np.isfinite(loss2)

# refresh: re-threshold the grid from the (updated) model and swap the
# tables across processes with ZERO recompiles
grid2 = density_grid_from_model(model, jax.tree.map(np.asarray, p),
                                resolution=16,
                                scale=float(base_sampler.bounds_max[0]),
                                alpha_threshold=1e-4)
occ.set_occupancy_grid(grid2)
occ_step.refresh()
p, o, loss3 = occ_step(p, o, perm_g, zero,
                       put_replicated(jnp.asarray(2, jnp.int32), mesh),
                       rng)
loss3 = float(loss3)
assert np.isfinite(loss3)

print(f"RESULT {loss1:.10f} {loss2:.10f} {loss3:.10f}")
