"""Arbitrary-pose frame rendering (the serving free-camera path).

``Raycaster.render_frame_pose`` takes the camera calibration
``(M = R @ K^-1, position)`` as traced jit arguments instead of a rig
index, so one compiled executable serves ANY pose at the sampler's
resolution. For a pose equal to a rig camera's, the output must be
BIT-IDENTICAL to the indexed ``render_frame`` (same algebra, same
executable shape); for a novel pose it must match a reference render
through a fresh sampler built around that camera.
"""

import jax
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.cameras import Resolution
from fourier_feature_nets_tpu.models import NeRF, Voxels
from fourier_feature_nets_tpu.render import RaySampler
from fourier_feature_nets_tpu.utils.camera_paths import orbit


@pytest.fixture(scope="module")
def cameras():
    return orbit(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                 4, 40.0, Resolution(20, 20), 3.0)


@pytest.fixture(scope="module")
def bounds():
    return np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)


def test_pose_matches_indexed_frame(cameras, bounds):
    """Rig camera via the pose path == the indexed path, bit-equal."""
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    sampler = RaySampler(bounds, cameras[:3], num_samples=16)
    for index in (0, 2):
        indexed = caster.render_frame(params, sampler, index,
                                      chunk_size=96)
        posed = caster.render_frame_pose(params, sampler,
                                         cameras[index], chunk_size=96)
        np.testing.assert_array_equal(posed, indexed)


def test_novel_pose_matches_fresh_sampler(cameras, bounds):
    """A pose OUTSIDE the rig == render through a sampler built for
    that camera (view-dependent model)."""
    model = NeRF(num_layers=2, num_channels=16, max_log_scale_pos=3.0,
                 num_freq_pos=4, max_log_scale_view=1.0,
                 num_freq_view=2, skips=[1], include_inputs=True)
    params = model.init(jax.random.PRNGKey(1))
    caster = ffn.Raycaster(model)
    rig = RaySampler(bounds, cameras[:3], num_samples=8)
    novel = cameras[3]  # never in the rig
    posed = caster.render_frame_pose(params, rig, novel, chunk_size=112)
    fresh = RaySampler(bounds, [novel], num_samples=8)
    ref = caster.render_frame(params, fresh, 0, chunk_size=112)
    np.testing.assert_array_equal(posed, ref)


def test_pose_single_compile(cameras, bounds):
    """One executable serves every pose (no per-pose recompiles)."""
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    sampler = RaySampler(bounds, cameras[:3], num_samples=8)
    caster.render_frame_pose(params, sampler, cameras[0],
                             chunk_size=100)
    fn, _ = caster._render_fns[
        ("frame", id(sampler), 100, False, False, 2, True, 0.0, 0,
         None)]
    sizes = fn._cache_size()
    caster.render_frame_pose(params, sampler, cameras[1],
                             chunk_size=100)
    caster.render_frame_pose(params, sampler, cameras[3],
                             chunk_size=100)
    assert fn._cache_size() == sizes == 1


def test_pose_culled_matches_indexed(cameras, bounds):
    """Pose path composes with occupancy culling, bit-equal to the
    indexed culled frame."""
    from fourier_feature_nets_tpu.octree import OcTree
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    rng = np.random.default_rng(2)
    points = rng.normal([0.4, 0.0, 0.0], 0.08, (4000, 3))
    anchors = np.array([[-1, -1, -1], [1, 1, 1]], np.float64)
    cloud = np.concatenate([points, anchors]).astype(np.float32)
    tree = OcTree.build_from_samples(cloud, depth=5, min_leaf_size=2)

    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    sampler = OccupancyGridSampler(tree, cameras[:3], num_samples=8,
                                   grid_resolution=16, num_probes=8,
                                   bounds=bounds)
    indexed = caster.render_frame(params, sampler, 1, chunk_size=128,
                                  cull_empty=True)
    posed = caster.render_frame_pose(params, sampler, cameras[1],
                                     chunk_size=128, cull_empty=True)
    np.testing.assert_array_equal(posed, indexed)


def test_novel_pose_focus_sampling_on_the_fly_cdfs(cameras, bounds):
    """Focus-sampling sampler (opacity model CDFs): the pose path must
    compute the pose rays' OWN CDFs on the fly — indexing the rig's
    precomputed tables by pixel offset would silently reuse camera 0's
    distribution. Cross-checked against a fresh sampler built around
    the novel camera (whose precomputed tables ARE that camera's)."""
    opacity = Voxels(side=8, scale=1.0)
    op_params = dict(opacity.init(jax.random.PRNGKey(7)))
    op_params["voxels"] = op_params["voxels"].at[..., 3].add(2.0)

    model = NeRF(num_layers=2, num_channels=16, max_log_scale_pos=3.0,
                 num_freq_pos=4, max_log_scale_view=1.0,
                 num_freq_view=2, skips=[1], include_inputs=True)
    params = model.init(jax.random.PRNGKey(1))
    caster = ffn.Raycaster(model)
    rig = RaySampler(bounds, cameras[:3], num_samples=8,
                     opacity_model=opacity, opacity_params=op_params)
    assert rig.focus_sampling
    novel = cameras[3]
    posed = caster.render_frame_pose(params, rig, novel,
                                     chunk_size=112)
    fresh = RaySampler(bounds, [novel], num_samples=8,
                       opacity_model=opacity,
                       opacity_params=op_params)
    ref = caster.render_frame(params, fresh, 0, chunk_size=112)
    assert np.abs(posed.astype(int) - ref.astype(int)).max() <= 1
    # and the rig-camera pose still matches the indexed frame
    indexed = caster.render_frame(params, rig, 1, chunk_size=112)
    posed_rig = caster.render_frame_pose(params, rig, cameras[1],
                                         chunk_size=112)
    assert np.abs(posed_rig.astype(int)
                  - indexed.astype(int)).max() <= 1


def test_octree_sampler_frame_matches_indexed_sample(cameras, bounds):
    """OctreeRaySampler places frame/pose samples via the same tree
    traversal as the indexed sample() path (regression: the frame
    path used to fall back to uniform spacing)."""
    from fourier_feature_nets_tpu.octree import OcTree
    from fourier_feature_nets_tpu.render.octree_sampler import (
        OctreeRaySampler,
    )
    rng = np.random.default_rng(3)
    points = rng.normal([0.4, 0.0, 0.0], 0.1, (3000, 3))
    anchors = np.array([[-1, -1, -1], [1, 1, 1]], np.float64)
    cloud = np.concatenate([points, anchors]).astype(np.float32)
    tree = OcTree.build_from_samples(cloud, depth=4, min_leaf_size=2)
    sampler = OctreeRaySampler(tree, cameras[:2], num_samples=8,
                               bounds=bounds)
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    ref = caster.render_image(params, sampler, 0, batch_size=64)
    out = caster.render_frame(params, sampler, 0, chunk_size=112)
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_pose_resolution_mismatch_raises(cameras, bounds):
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    sampler = RaySampler(bounds, cameras[:2], num_samples=8)
    bad = orbit(np.array([0.0, 1.0, 0.0]), np.array([0.0, 0.0, 1.0]),
                1, 40.0, Resolution(10, 10), 3.0)[0]
    with pytest.raises(ValueError, match="resolution"):
        caster.render_frame_pose(params, sampler, bad)
