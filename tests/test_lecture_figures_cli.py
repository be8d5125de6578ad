"""Smoke tests: new lecture figures + near_orbit / mesh_to_octree CLIs
(reference figures/fourier1d.py, fourier2d.py, near_orbit.py,
mesh_to_octree.py parity)."""

import os

import numpy as np
import pytest

from fourier_feature_nets_tpu.lecture.figures import (
    fourier1d_figure,
    fourier2d_figure,
)

pytest.importorskip("matplotlib")


def test_fourier1d_figure_and_tsv(tmp_path):
    tsv = str(tmp_path / "fourier_plots.tsv")
    fig = fourier1d_figure(num_samples=32, num_freqs=3, tsv_path=tsv)
    assert fig is not None
    lines = open(tsv).read().strip().split("\n")
    assert len(lines) == 33  # header + num_samples rows
    assert lines[0].split("\t") == (
        ["t", "f(t)"] + [f"basis{i}" for i in range(3)]
        + [f"recon{i}" for i in range(3)])
    # the full reconstruction row count matches and values are finite
    values = np.loadtxt(tsv, skiprows=1)
    assert values.shape == (32, 8)
    assert np.isfinite(values).all()


def test_fourier2d_figure():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 2 * np.pi, 32)
    image = (np.sin(3 * x)[None, :] + np.cos(2 * x)[:, None]
             + 0.1 * rng.normal(size=(32, 32)))
    fig = fourier2d_figure(image=image, num_gratings=2)
    assert fig is not None


def test_near_orbit_cli(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from fourier_feature_nets_tpu.cli.near_orbit import main
    from fourier_feature_nets_tpu.datasets.synthetic import (
        generate_synthetic_dataset,
    )

    path = str(tmp_path / "scene.npz")
    generate_synthetic_dataset(path, resolution=16,
                               split_counts=(4, 1, 1), volume_side=16,
                               num_samples=16)
    mp4 = str(tmp_path / "near.mp4")
    main([path, mp4, "--num-frames", "4", "--resolution", "16"])
    assert os.path.getsize(mp4) > 0
    cap = cv2.VideoCapture(mp4)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 4


def test_mesh_to_octree_fails_cleanly_without_trimesh(tmp_path):
    from fourier_feature_nets_tpu.cli.mesh_to_octree import main

    with pytest.raises((ImportError, NotImplementedError, OSError,
                        FileNotFoundError)):
        main([str(tmp_path / "missing.obj"), str(tmp_path / "out.npz")])
