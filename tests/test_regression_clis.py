"""End-to-end smoke tests for the 1D/2D regression trainers and the
ray-sampling inspection tool (subprocess-free, tiny budgets).

These are the only reference CLIs (train_image_regression.py,
train_signal_regression.py, test_ray_sampling.py upstream) whose
end-to-end paths were previously exercised only by hand-recorded runs
in docs/RESULTS.md; everything asserted here is the user-visible
contract: the run completes, reports PSNR/loss, and writes its
artifacts.
"""

import os

import numpy as np
import pytest

from fourier_feature_nets_tpu.datasets.synthetic import (
    generate_synthetic_dataset,
)


@pytest.fixture(scope="module")
def scene_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "scene.npz"
    return generate_synthetic_dataset(str(path), resolution=24,
                                      split_counts=(3, 2, 1),
                                      volume_side=16, num_samples=64)


def test_train_signal_regression_cli(tmp_path):
    from fourier_feature_nets_tpu.cli.train_signal_regression import main

    out = str(tmp_path / "sig")
    main(["multifreq", out, "--fourier", "--num-steps", "120",
          "--num-channels", "16", "--num-samples", "16",
          "--num-plot", "24", "--report-interval", "60", "--no-plot"])
    files = os.listdir(out)
    assert any(name.endswith(".npz") for name in files), files


def test_train_image_regression_cli(tmp_path):
    from fourier_feature_nets_tpu.cli.train_image_regression import main

    out = str(tmp_path / "img")
    main(["synthetic", "positional", out, "--image-size", "32",
          "--num-channels", "16", "--embedding-size", "16",
          "--num-steps", "60", "--report-interval", "30",
          "--color-space", "RGB"])
    files = os.listdir(out)
    assert any(name.endswith(".npz") for name in files), files
    assert any(name.endswith(".png") for name in files), files


def test_inspect_ray_sampling_cli(scene_path, tmp_path):
    from fourier_feature_nets_tpu.cli.inspect_ray_sampling import main

    out = str(tmp_path / "rays")
    main([scene_path, out, "--num-cameras", "2",
          "--num-samples", "8"])
    pngs = [name for name in os.listdir(out) if name.endswith(".png")]
    assert pngs, os.listdir(out)


def test_debug_utils_smoke(tmp_path, monkeypatch):
    """utils/debug: the NaN switch toggles the jax config flag and the
    profile context writes a trace directory."""
    import jax

    from fourier_feature_nets_tpu.utils import debug

    debug.enable_debug_nans(True)
    assert jax.config.jax_debug_nans
    debug.enable_debug_nans(False)
    assert not jax.config.jax_debug_nans

    monkeypatch.setenv("FFN_TPU_DEBUG_NANS", "1")
    debug.init_from_env()
    assert jax.config.jax_debug_nans
    debug.enable_debug_nans(False)

    log_dir = str(tmp_path / "trace")
    with debug.profile(log_dir):
        np.dot(np.ones((4, 4)), np.ones((4, 4)))
    assert os.path.isdir(log_dir)
