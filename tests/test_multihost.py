"""Two-process multi-host bootstrap test (SURVEY.md §2.2 DCN mandate).

The reference has no distributed machinery at all; this framework's
multi-host story is ``jax.distributed`` + a global mesh
(parallel/mesh.py::initialize_distributed). This test exercises it
end-to-end WITHOUT TPU hardware: two local processes, a localhost
coordinator, 4 virtual CPU devices each, one global 8-device mesh,
data-parallel train steps through the explicit-collective shard_map
path, an occupancy-guided sampler swap, and a cross-process table
refresh (VERDICT r2 item 5).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from fourier_feature_nets_tpu.datasets.synthetic import (
    generate_synthetic_dataset,
)

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(scene, num_processes, mode, local_devices):
    port = _free_port()
    env = dict(os.environ)
    # the workers bring up their own virtual CPU devices; drop the
    # parent suite's flags so counts don't double up
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(num_processes),
             str(port), str(scene), mode, str(local_devices)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env)
        for pid in range(num_processes)
    ]
    outputs = []
    for proc in procs:
        try:
            out, _ = proc.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            raise
        outputs.append(out)

    for pid, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, (
            f"worker {pid} failed:\n{out[-4000:]}")

    # every process must report identical (replicated) results
    results = []
    for out in outputs:
        lines = [ln for ln in out.splitlines()
                 if ln.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append([float(v) for v in lines[-1].split()[1:]])
    for other in results[1:]:
        np.testing.assert_allclose(results[0], other, rtol=1e-7)
    assert all(np.isfinite(results[0]))


@pytest.fixture()
def scene(tmp_path):
    path = tmp_path / "scene.npz"
    generate_synthetic_dataset(str(path), resolution=24,
                               split_counts=(3, 1, 1), volume_side=16,
                               num_samples=64)
    return path


@pytest.mark.slow
def test_two_process_bootstrap_and_dp_fit(scene):
    _run_workers(scene, 2, "collectives", 4)


@pytest.mark.slow
def test_four_process_gspmd_fit(scene):
    """The production jit path (fit with a GSPMD mesh: sharding
    constraint on the ray batch, scan chunks, crop curriculum,
    occupancy-guided phase, full validation) certified under a
    4-process x 2-device global mesh — not just the explicit
    shard_map collectives the bootstrap test covers."""
    _run_workers(scene, 4, "fit", 2)
