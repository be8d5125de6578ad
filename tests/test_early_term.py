"""Early ray termination: split compositing + culled frame variant.

The emission-absorption integral splits exactly at any sample
boundary (cumprod associativity), so the prefix weights are bit-equal
to the unsplit prefix and the combine ``C1 + T1 * C2`` agrees to ULPs.
The frame path drops rays whose transmittance after ``early_split``
samples is below ``early_term``; each skipped sample's contribution is
bounded by the threshold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.cameras import Resolution
from fourier_feature_nets_tpu.models import Voxels
from fourier_feature_nets_tpu.octree import OcTree
from fourier_feature_nets_tpu.ops import (
    blend_weights_prefix,
    blend_weights_suffix,
    calculate_blend_weights,
)
from fourier_feature_nets_tpu.render.occupancy_sampler import (
    OccupancyGridSampler,
)
from fourier_feature_nets_tpu.utils.camera_paths import orbit


def test_prefix_weights_bit_equal():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(1.0, 4.0, (32, 16)), axis=-1)
    opacity = rng.uniform(0.0, 5.0, (32, 16)).astype(np.float32)
    t = jnp.asarray(t, jnp.float32)
    opacity = jnp.asarray(opacity)
    full = calculate_blend_weights(t, opacity)
    for k in (1, 7, 15):
        w, trans_out = blend_weights_prefix(t, opacity[..., :k])
        np.testing.assert_array_equal(np.asarray(w),
                                      np.asarray(full[..., :k]))
        # outgoing transmittance = incoming transmittance of sample k
        terms = jnp.minimum(
            1.0, 1.0 - (1.0 - jnp.exp(
                -opacity[..., :k]
                * (t[..., 1:k + 1] - t[..., :k]))) + 1e-10)
        expect = jnp.prod(terms, axis=-1)
        np.testing.assert_allclose(np.asarray(trans_out),
                                   np.asarray(expect), rtol=1e-6)


def test_split_reconstructs_full_integral():
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(1.0, 4.0, (64, 24)), axis=-1)
    opacity = rng.uniform(0.0, 8.0, (64, 24)).astype(np.float32)
    t = jnp.asarray(t, jnp.float32)
    opacity = jnp.asarray(opacity)
    color = jnp.asarray(rng.uniform(0, 1, (64, 24, 3)), jnp.float32)
    full_w = calculate_blend_weights(t, opacity)
    full_c = jnp.sum(full_w[..., None] * color, axis=-2)
    for k in (8, 12, 23):
        w1, t1 = blend_weights_prefix(t, opacity[..., :k])
        w2 = blend_weights_suffix(t, opacity[..., k:])
        c1 = jnp.sum(w1[..., None] * color[:, :k], axis=-2)
        c2 = jnp.sum(w2[..., None] * color[:, k:], axis=-2)
        np.testing.assert_allclose(np.asarray(c1 + t1[:, None] * c2),
                                   np.asarray(full_c), rtol=2e-6,
                                   atol=2e-6)


@pytest.fixture(scope="module")
def scene():
    cameras = orbit(np.array([0.0, 1.0, 0.0]),
                    np.array([0.0, 0.0, 1.0]), 3, 40.0,
                    Resolution(20, 20), 3.0)
    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    rng = np.random.default_rng(2)
    points = rng.normal([0.3, 0.0, 0.0], 0.15, (4000, 3))
    anchors = np.array([[-1, -1, -1], [1, 1, 1]], np.float64)
    cloud = np.concatenate([points, anchors]).astype(np.float32)
    tree = OcTree.build_from_samples(cloud, depth=5, min_leaf_size=2)
    sampler = OccupancyGridSampler(tree, cameras, num_samples=12,
                                   grid_resolution=16, num_probes=8,
                                   bounds=bounds)
    return cameras, bounds, sampler


def _opaque_params(model, key, level):
    """Init params with the opacity channel forced to ``level``."""
    params = dict(model.init(key))
    params["voxels"] = params["voxels"].at[..., 3].set(level)
    # default bias is logit(1e-5) rgb (black) / -2 opacity — zero it
    # so colors are mid-gray and the opacity level applies unshifted
    params["bias"] = jnp.zeros_like(params["bias"])
    return params


def test_early_term_matches_culled_when_nothing_saturates(scene):
    """eps below any reachable transmittance: every hit ray survives,
    the split integral must reproduce the unsplit frame (<= 1 LSB
    from the reordered final multiply)."""
    _, _, sampler = scene
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    base = caster.render_frame(params, sampler, 0, chunk_size=128)
    early = caster.render_frame(params, sampler, 0, chunk_size=128,
                                early_term=1e-12)
    assert np.abs(early.astype(int) - base.astype(int)).max() <= 1


def test_early_term_opaque_scene_quality(scene):
    """High-opacity scene: most rays saturate early; the terminated
    frame must still match the full render (skipped contributions are
    bounded by eps)."""
    _, _, sampler = scene
    model = Voxels(side=8, scale=1.0)
    params = _opaque_params(model, jax.random.PRNGKey(1), 50.0)
    caster = ffn.Raycaster(model)
    base = caster.render_frame(params, sampler, 1, chunk_size=128)
    early = caster.render_frame(params, sampler, 1, chunk_size=128,
                                early_term=1e-3, early_split=4)
    assert np.abs(early.astype(int) - base.astype(int)).max() <= 1


def test_early_term_actually_skips(scene):
    """eps > 1 terminates EVERY hit ray after the prefix — on a
    translucent scene the tail contributes visibly, so the output
    must differ from the full render (proves the suffix pass really
    is skipped, not just recomputed)."""
    _, _, sampler = scene
    model = Voxels(side=8, scale=1.0)
    params = _opaque_params(model, jax.random.PRNGKey(2), 0.8)
    caster = ffn.Raycaster(model)
    base = caster.render_frame(params, sampler, 0, chunk_size=128)
    prefix_only = caster.render_frame(params, sampler, 0,
                                      chunk_size=128, early_term=2.0,
                                      early_split=3)
    assert np.abs(prefix_only.astype(int) - base.astype(int)).max() > 3


def test_early_term_pose_path(scene):
    """Composes with the free-pose path."""
    cameras, _, sampler = scene
    model = Voxels(side=8, scale=1.0)
    params = _opaque_params(model, jax.random.PRNGKey(3), 50.0)
    caster = ffn.Raycaster(model)
    indexed = caster.render_frame(params, sampler, 2, chunk_size=128,
                                  early_term=1e-3, early_split=4)
    posed = caster.render_frame_pose(params, sampler, cameras[2],
                                     chunk_size=128, early_term=1e-3,
                                     early_split=4)
    np.testing.assert_array_equal(posed, indexed)


def test_early_term_bad_split_raises(scene):
    _, _, sampler = scene
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    with pytest.raises(ValueError, match="early_split"):
        caster.render_frame(params, sampler, 0, chunk_size=128,
                            early_term=1e-3, early_split=12)
