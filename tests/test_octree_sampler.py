"""Octree-accelerated sampling: empty-space skipping correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fourier_feature_nets_tpu.cameras import Resolution
from fourier_feature_nets_tpu.octree import OcTree
from fourier_feature_nets_tpu.render.octree_sampler import (
    OctreeRaySampler,
    occupancy_t_values,
)
from fourier_feature_nets_tpu.utils.camera_paths import hemisphere


@pytest.fixture(scope="module")
def tree():
    """Octree around a small off-center blob."""
    rng = np.random.default_rng(1)
    points = rng.normal([0.4, 0.0, 0.0], 0.08, (4000, 3))
    # anchor points so the tree cube spans ~[-1, 1]
    anchors = np.array([[-1, -1, -1], [1, 1, 1]], np.float64)
    cloud = np.concatenate([points, anchors]).astype(np.float32)
    return OcTree.build_from_samples(cloud, depth=5, min_leaf_size=2)


@pytest.fixture(scope="module")
def cameras():
    return hemisphere(np.array([0.0, 1.0, 0.0]),
                      np.array([0.0, 0.0, 1.0]), 2, 40.0,
                      Resolution(16, 16), 3.0, pos_noise=0.0,
                      rng=np.random.default_rng(0))


class TestOccupancyTValues:
    def test_concentrates_in_occupied_interval(self):
        t_stops = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]])
        leaves = jnp.asarray([[-1, 5, -1, -1, -1]])  # [1,2] occupied
        t = occupancy_t_values(t_stops, leaves, 64,
                               jax.random.PRNGKey(0))
        t = np.asarray(t)[0]
        inside = ((t >= 1.0) & (t <= 2.0)).mean()
        assert inside > 0.95, inside

    def test_sorted_output(self):
        t_stops = jnp.asarray([[0.0, 0.5, 1.5, 2.0, 4.0]])
        leaves = jnp.asarray([[3, -1, 7, -1, -1]])
        t = occupancy_t_values(t_stops, leaves, 32,
                               jax.random.PRNGKey(1))
        assert (np.diff(np.asarray(t)[0]) >= 0).all()

    def test_all_empty_falls_back_uniform(self):
        """No occupied cells: samples still spread over the range."""
        t_stops = jnp.asarray([[1.0, 2.0, 3.0]])
        leaves = jnp.asarray([[-1, -1, -1]])
        t = np.asarray(occupancy_t_values(t_stops, leaves, 16))[0]
        assert t.min() >= 1.0 - 1e-5 and t.max() <= 3.0 + 1e-5
        assert t.std() > 0.3


class TestOctreeRaySampler:
    def test_samples_cluster_near_occupied_region(self, tree, cameras):
        sampler = OctreeRaySampler(tree, cameras, num_samples=32)
        # rays through the image center point at the origin region
        idx = sampler._valid_for_camera(0)
        rays = sampler.sample(jnp.asarray(idx),
                              rng=jax.random.PRNGKey(0))
        positions = np.asarray(rays.positions)
        # the blob sits at (0.4, 0, 0): rays that pass within 0.15 of
        # it should place most samples nearby
        dist = np.linalg.norm(positions - np.array([0.4, 0.0, 0.0]),
                              axis=-1)
        hits = dist.min(-1) < 0.1
        if hits.any():
            frac_near = (dist[hits] < 0.5).mean()
            assert frac_near > 0.6, frac_near

    def test_jittable(self, tree, cameras):
        sampler = OctreeRaySampler(tree, cameras, num_samples=16,
                                   stratified=True)

        @jax.jit
        def sample_fn(idx, key):
            return sampler.sample(idx, rng=key)

        idx = jnp.asarray(sampler._valid_for_camera(0)[:8])
        rays = sample_fn(idx, jax.random.PRNGKey(0))
        assert rays.positions.shape == (8, 16, 3)
        assert not np.isnan(np.asarray(rays.positions)).any()

    def test_renders_through_raycaster(self, tree, cameras):
        import fourier_feature_nets_tpu as ffn
        from fourier_feature_nets_tpu.models import Voxels
        model = Voxels(side=8, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        caster = ffn.Raycaster(model)
        sampler = OctreeRaySampler(tree, cameras, num_samples=16)
        image = caster.render_image(params, sampler, 0, batch_size=128)
        assert image.shape == (16, 16, 3)


class TestOccupancyGridSampler:
    def test_occupancy_grid_covers_leaves(self, tree):
        from fourier_feature_nets_tpu.render.occupancy_sampler import (
            occupancy_grid_from_tree,
        )
        grid = occupancy_grid_from_tree(tree, resolution=32, dilate=0)
        centers = tree.leaf_centers()
        cells = np.clip(((centers / tree.scale + 1) * 0.5 * 32)
                        .astype(int), 0, 31)
        occ = grid[cells[:, 2], cells[:, 1], cells[:, 0]]
        assert occ.mean() > 0.99  # every leaf center marked occupied
        assert grid.mean() < 0.5  # but the volume is mostly empty

    def test_samples_concentrate(self, tree, cameras):
        from fourier_feature_nets_tpu.render.occupancy_sampler import (
            OccupancyGridSampler,
        )
        sampler = OccupancyGridSampler(tree, cameras, num_samples=32,
                                       grid_resolution=32,
                                       num_probes=32)
        idx = sampler._valid_for_camera(0)
        rays = sampler.sample(jnp.asarray(idx))
        t = np.asarray(rays.t_values)
        assert (np.diff(t, axis=-1) >= -1e-5).all()  # sorted
        positions = np.asarray(rays.positions)
        dist = np.linalg.norm(positions - np.array([0.4, 0.0, 0.0]),
                              axis=-1)
        hits = dist.min(-1) < 0.1
        if hits.any():
            assert (dist[hits] < 0.5).mean() > 0.5

    def test_jit_and_render(self, tree, cameras):
        import fourier_feature_nets_tpu as ffn
        from fourier_feature_nets_tpu.models import Voxels
        from fourier_feature_nets_tpu.render.occupancy_sampler import (
            OccupancyGridSampler,
        )
        model = Voxels(side=8, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        sampler = OccupancyGridSampler(tree, cameras, num_samples=16,
                                       grid_resolution=32,
                                       num_probes=16, stratified=True)

        @jax.jit
        def sample_fn(idx, key):
            return sampler.sample(idx, rng=key)

        rays = sample_fn(jnp.asarray(sampler._valid_for_camera(0)[:8]),
                         jax.random.PRNGKey(0))
        assert not np.isnan(np.asarray(rays.positions)).any()
        image = ffn.Raycaster(model).render_image(params, sampler, 0,
                                                  batch_size=128)
        assert image.shape == (16, 16, 3)


class TestOccupancyProbeMatmul:
    def test_matmul_matches_gather_at_full_resolution(self, tree,
                                                      cameras):
        """probe_resolution == grid_resolution: the one-hot matmul
        lookup must agree with the exact flat gather everywhere."""
        from fourier_feature_nets_tpu.render.occupancy_sampler import (
            OccupancyGridSampler,
        )
        mm = OccupancyGridSampler(tree, cameras, 8, grid_resolution=16,
                                  num_probes=8, probe_mode="matmul",
                                  probe_resolution=16)
        ex = OccupancyGridSampler(tree, cameras, 8, grid_resolution=16,
                                  num_probes=8, probe_mode="gather")
        rng = np.random.default_rng(3)
        pts = jnp.asarray(rng.uniform(-1, 1, (1000, 3))
                          .astype(np.float32) * float(tree.scale))
        np.testing.assert_array_equal(np.asarray(mm._occupancy_at(pts)),
                                      np.asarray(ex._occupancy_at(pts)))

    def test_coarse_table_is_conservative(self, tree, cameras):
        """Max-pooled probe occupancy is a superset of the fine grid."""
        from fourier_feature_nets_tpu.render.occupancy_sampler import (
            OccupancyGridSampler,
        )
        s = OccupancyGridSampler(tree, cameras, 8, grid_resolution=32,
                                 num_probes=8, probe_resolution=16)
        rng = np.random.default_rng(4)
        pts = jnp.asarray(rng.uniform(-1, 1, (2000, 3))
                          .astype(np.float32) * float(tree.scale))
        coarse = np.asarray(s._occupancy_at(pts))
        fine = OccupancyGridSampler(tree, cameras, 8, grid_resolution=32,
                                    num_probes=8, probe_mode="gather")
        exact = np.asarray(fine._occupancy_at(pts))
        assert (coarse >= exact).all()

    def test_sample_still_jittable(self, tree, cameras):
        from fourier_feature_nets_tpu.render.occupancy_sampler import (
            OccupancyGridSampler,
        )
        s = OccupancyGridSampler(tree, cameras, 8, grid_resolution=16,
                                 num_probes=8, stratified=True)

        @jax.jit
        def fn(idx, key):
            return s.sample(idx, rng=key)

        rays = fn(jnp.asarray(s._valid_for_camera(0)[:16]),
                  jax.random.PRNGKey(0))
        assert rays.positions.shape == (16, 8, 3)
        assert not np.isnan(np.asarray(rays.positions)).any()


class TestDensityGridSampler:
    def test_density_grid_matches_voxel_opacity(self):
        """from_model occupancy marks exactly the cells where the
        model's own density exceeds the alpha threshold — validated
        against a Voxels grid with a known opaque block."""
        from fourier_feature_nets_tpu.models import Voxels
        from fourier_feature_nets_tpu.render.occupancy_sampler import (
            density_grid_from_model,
        )
        model = Voxels(side=8, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        # opaque block in one octant, zero elsewhere (voxel grid is
        # (side, side, side, 4) with opacity logits in channel 3)
        voxels = np.zeros((8, 8, 8, 4), np.float32)
        voxels[..., 3] = -20.0                 # softplus(-20) ~ 0
        voxels[4:, 4:, 4:, 3] = 20.0           # softplus(20) ~ 20
        params = {"voxels": jnp.asarray(voxels),
                  "bias": jnp.zeros((4,), jnp.float32)}

        grid = density_grid_from_model(model, params, resolution=16,
                                       scale=1.0,
                                       alpha_threshold=1e-3)
        assert grid.shape == (16, 16, 16)
        # the occupied octant (z, y, x all positive) is marked...
        assert grid[9:15, 9:15, 9:15].mean() > 0.99
        # ...and the opposite octant is empty
        assert grid[:7, :7, :7].max() == 0.0

    def test_from_model_sampler_renders(self, cameras):
        import fourier_feature_nets_tpu as ffn
        from fourier_feature_nets_tpu.models import Voxels
        from fourier_feature_nets_tpu.render.occupancy_sampler import (
            OccupancyGridSampler,
        )
        model = Voxels(side=8, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        sampler = OccupancyGridSampler.from_model(
            model, params, cameras, num_samples=16, grid_resolution=16)
        assert sampler.tree is None
        caster = ffn.Raycaster(model)
        image = caster.render_frame(params, sampler, 0, chunk_size=64)
        assert image.shape == (16, 16, 3)

    def test_explicit_grid_requires_scale(self, cameras):
        from fourier_feature_nets_tpu.render.occupancy_sampler import (
            OccupancyGridSampler,
        )
        grid = np.ones((8, 8, 8), np.float32)
        with pytest.raises(ValueError):
            OccupancyGridSampler(None, cameras, 8, occupancy_grid=grid)
        sampler = OccupancyGridSampler(None, cameras, 8,
                                       occupancy_grid=grid,
                                       grid_scale=1.0)
        assert sampler._grid_resolution == 8


def test_occupancy_stratified_jitter_is_layout_invariant(tree, cameras):
    """Stratified occupancy jitter is keyed by GLOBAL ray id, so any
    batch ordering (and hence any data-parallel sharding) draws the
    same samples for the same ray (the layout-invariance contract of
    ray_sampler.sample, extended to the occupancy path)."""
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    sampler = OccupancyGridSampler(tree, cameras, num_samples=16,
                                   grid_resolution=32, num_probes=16,
                                   stratified=True)
    idx = jnp.asarray(sampler._valid_for_camera(0)[:32])
    key = jax.random.PRNGKey(7)
    t_fwd = np.asarray(sampler.sample(idx, rng=key).t_values)
    perm = np.random.default_rng(0).permutation(len(idx))
    t_perm = np.asarray(sampler.sample(idx[perm], rng=key).t_values)
    np.testing.assert_allclose(t_perm, t_fwd[perm], rtol=1e-6)


def test_octree_stratified_jitter_is_layout_invariant(tree, cameras):
    """The octree sampler's stratified quantiles are keyed by global
    ray id (per_ray_uniform), matching the layout-invariance contract
    of the other samplers — and sorted by construction, so no per-ray
    sort (a TPU bitonic-network pathology) is needed."""
    sampler = OctreeRaySampler(tree, cameras, num_samples=16)
    object.__setattr__(sampler, "stratified", True)
    idx = jnp.asarray(sampler._valid_for_camera(0)[:32])
    key = jax.random.PRNGKey(7)
    t_fwd = np.asarray(sampler.sample(idx, rng=key).t_values)
    assert (np.diff(t_fwd, axis=-1) >= -1e-6).all()
    perm = np.random.default_rng(0).permutation(len(idx))
    t_perm = np.asarray(sampler.sample(idx[perm], rng=key).t_values)
    np.testing.assert_allclose(t_perm, t_fwd[perm], rtol=1e-6)
