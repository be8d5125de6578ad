"""Smoke tests for the model-dependent lecture animations
(voxels_animation / view_angle_animation — reference
visualizations/voxels_animation.py and view_angle.py parity)."""

import os

import jax
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.datasets.synthetic import (
    generate_synthetic_dataset,
)
from fourier_feature_nets_tpu.lecture import (
    view_angle_animation,
    voxels_animation,
)
from fourier_feature_nets_tpu.octree import OcTree

pytest.importorskip("cv2")
pytest.importorskip("matplotlib")


def test_voxels_animation(tmp_path):
    rng = np.random.default_rng(0)
    cloud = rng.uniform(-0.9, 0.9, (512, 3)).astype(np.float32)
    data = np.concatenate([(cloud + 1) / 2, np.ones_like(cloud[:, :1])],
                          -1).astype(np.float32)
    tree = OcTree.build_from_samples(cloud, depth=5, min_leaf_size=1,
                                     data=data)
    out = str(tmp_path)
    voxels_animation(tree, out, min_depth=3, num_frames=3)
    frames = sorted(os.listdir(os.path.join(out, "voxels")))
    assert len(frames) == 3
    assert os.path.exists(os.path.join(out, "voxels.mp4"))


def test_view_angle_animation(tmp_path):
    path = str(tmp_path / "scene.npz")
    generate_synthetic_dataset(path, resolution=32,
                               split_counts=(4, 1, 1), volume_side=16,
                               num_samples=32)
    dataset = ffn.ImageDataset.load(path, "train", num_samples=16,
                                    include_alpha=True, stratified=False)
    model = ffn.NeRF(num_layers=2, num_channels=16, max_log_scale_pos=3.0,
                     num_freq_pos=4, max_log_scale_view=1.0,
                     num_freq_view=2, skips=[1], include_inputs=True)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    out = str(tmp_path)
    count = view_angle_animation(dataset, caster, params, out,
                                 camera=1, angle_threshold=-1.0,
                                 patch_size=8, zoom_size=16)
    assert count > 0
    frames = sorted(os.listdir(os.path.join(out, "view_angle")))
    assert len(frames) == count
    assert os.path.exists(os.path.join(out, "view_angle.mp4"))
