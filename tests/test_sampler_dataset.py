"""RaySampler + ImageDataset behavior tests on a tiny synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.datasets import Mode
from fourier_feature_nets_tpu.datasets.synthetic import (
    generate_synthetic_dataset,
)


@pytest.fixture(scope="module")
def scene_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "scene.npz"
    return generate_synthetic_dataset(str(path), resolution=32,
                                      split_counts=(4, 2, 1),
                                      volume_side=24, num_samples=96)


@pytest.fixture(scope="module")
def train_dataset(scene_path):
    return ffn.ImageDataset.load(scene_path, "train", num_samples=32)


class TestNPZSchema:
    def test_schema(self, scene_path):
        data = np.load(scene_path)
        assert set(data.files) >= {"images", "intrinsics", "extrinsics",
                                   "bounds", "split_counts"}
        assert data["images"].dtype == np.uint8
        assert data["images"].shape == (7, 32, 32, 4)
        assert data["intrinsics"].shape == (7, 3, 3)
        assert data["extrinsics"].shape == (7, 4, 4)
        assert data["bounds"].shape == (4, 4)

    def test_splits(self, scene_path):
        train = ffn.ImageDataset.load(scene_path, "train", num_samples=8)
        val = ffn.ImageDataset.load(scene_path, "val", num_samples=8)
        test = ffn.ImageDataset.load(scene_path, "test", num_samples=8)
        assert train.num_cameras == 4
        assert val.num_cameras == 2
        assert test.num_cameras == 1


class TestRaySampler:
    def test_sample_shapes(self, train_dataset):
        sampler = train_dataset.sampler
        idx = jnp.asarray(train_dataset.index_pool()[:16])
        rays = sampler.sample(idx, 0)
        assert rays.positions.shape == (16, 32, 3)
        assert rays.view_directions.shape == (16, 32, 3)
        assert rays.t_values.shape == (16, 32)
        np.testing.assert_array_equal(np.asarray(rays.rays),
                                      np.asarray(idx))

    def test_positions_on_ray(self, train_dataset):
        sampler = train_dataset.sampler
        idx = train_dataset.index_pool()[:8]
        rays = sampler.sample(jnp.asarray(idx), 0)
        starts = np.asarray(sampler.starts)[idx]
        dirs = np.asarray(sampler.directions)[idx]
        expected = (starts[:, None] + np.asarray(rays.t_values)[..., None]
                    * dirs[:, None])
        np.testing.assert_allclose(np.asarray(rays.positions), expected,
                                   rtol=1e-4, atol=1e-4)

    def test_t_values_sorted_within_near_far(self, train_dataset):
        sampler = train_dataset.sampler
        idx = train_dataset.index_pool()[:64]
        rays = sampler.sample(jnp.asarray(idx), 0)
        t = np.asarray(rays.t_values)
        assert (np.diff(t, axis=-1) >= 0).all()
        near = np.asarray(sampler.near)[idx]
        far = np.asarray(sampler.far)[idx]
        assert (t >= near[:, None] - 1e-5).all()
        assert (t <= far[:, None] + 1e-5).all()

    def test_sample_is_jittable(self, train_dataset):
        sampler = train_dataset.sampler
        idx = jnp.asarray(train_dataset.index_pool()[:8])

        @jax.jit
        def sample_fn(idx, step):
            return sampler.sample(idx, step)

        rays = sample_fn(idx, jnp.asarray(0, jnp.int32))
        assert rays.positions.shape == (8, 32, 3)

    def test_valid_mask_matches_bounds(self, train_dataset):
        """Rays flagged valid must intersect the bounds volume."""
        sampler = train_dataset.sampler
        valid = sampler.valid
        # the object covers a minority of the frame: some rays miss
        assert 0 < valid.sum() <= sampler.num_rays

    def test_stratified_sampler_randomizes(self, scene_path):
        ds = ffn.ImageDataset.load(scene_path, "train", num_samples=16,
                                   stratified=True)
        idx = jnp.asarray(ds.index_pool()[:4])
        r1 = ds.sampler.sample(idx, 0, jax.random.PRNGKey(0))
        r2 = ds.sampler.sample(idx, 0, jax.random.PRNGKey(1))
        assert not np.allclose(np.asarray(r1.t_values),
                               np.asarray(r2.t_values))

    def test_to_image_scatter(self, train_dataset):
        sampler = train_dataset.sampler
        idx = sampler._valid_for_camera(0)
        colors = np.full((len(idx), 3), 0.5, np.float32)
        image = sampler.to_image(0, colors)
        assert image.shape == (32, 32, 3)
        flat = image.reshape(-1, 3)
        np.testing.assert_array_equal(
            flat[idx - 0 * sampler.rays_per_camera][:, 0], 127)


class TestImageDatasetModes:
    def test_center_mode_indices_inside_crop(self, train_dataset):
        w = train_dataset.image_width
        pool = train_dataset._mode_index(Mode.Center)
        local = pool % train_dataset.sampler.rays_per_camera
        x = local % w
        y = local // w
        assert (x >= w // 4).all() and (x < w - w // 4).all()
        assert (y >= w // 4).all() and (y < w - w // 4).all()

    def test_sparse_mode_count(self, train_dataset):
        pool = train_dataset._mode_index(Mode.Sparse)
        # sparse_size=50 > image size 32 means index grid of 50x50
        assert len(pool) == train_dataset.num_cameras * 50 * 50

    def test_dilate_mode_superset_of_alpha(self, train_dataset):
        dilate = set(train_dataset._mode_index(Mode.Dilate).tolist())
        alphas = np.asarray(train_dataset.alphas)
        object_rays = set(np.nonzero(alphas > 0)[0].tolist())
        assert object_rays <= dilate

    def test_mode_len(self, train_dataset):
        train_dataset.mode = Mode.Full
        full_len = len(train_dataset)
        train_dataset.mode = Mode.Center
        center_len = len(train_dataset)
        train_dataset.mode = Mode.Full
        assert center_len < full_len
        assert full_len == train_dataset.sampler.num_rays

    def test_patch_mode_tiles_patches(self, train_dataset):
        """Patch mode (declared but unimplemented in the reference,
        ray_dataset.py:34 / image_dataset.py:293): consecutive runs of
        patch_size**2 indices tile one square patch."""
        train_dataset.mode = Mode.Patch
        try:
            k = train_dataset.patch_size
            pool = train_dataset._mode_index(Mode.Patch)
            w = train_dataset.image_width
            first = pool[:k * k] % train_dataset.sampler.rays_per_camera
            xs, ys = first % w, first // w
            assert xs.max() - xs.min() == k - 1
            assert ys.max() - ys.min() == k - 1
            assert len(set(map(tuple, np.stack([xs, ys], -1)))) == k * k
            # usable end-to-end
            rays = train_dataset.get_rays(np.arange(k * k), 0)
            assert rays.positions.shape[0] <= k * k
        finally:
            train_dataset.mode = Mode.Full

    def test_render_zeroes_background(self, train_dataset):
        alphas = np.asarray(train_dataset.alphas)
        bg = np.nonzero(alphas == 0)[0][:4]
        result = train_dataset.render(jnp.asarray(bg))
        np.testing.assert_allclose(np.asarray(result.color), 0.0)

    def test_loss_alpha_weighted(self, train_dataset):
        idx = jnp.asarray(train_dataset.index_pool()[:32])
        gt = train_dataset.render(idx)
        perfect = ffn.RenderResult(gt.color, gt.alpha, None)
        assert float(train_dataset.loss(idx, perfect)) < 1e-10
        wrong = ffn.RenderResult(gt.color, 1.0 - gt.alpha, None)
        assert float(train_dataset.loss(idx, wrong)) > 0

    def test_sample_cameras_subset(self, train_dataset):
        sub = train_dataset.sample_cameras(2, 16, False)
        assert sub.num_cameras == 2
        assert sub.num_samples == 16

    def test_get_rays_respects_mode(self, train_dataset):
        train_dataset.mode = Mode.Center
        rays = train_dataset.get_rays(np.arange(16), 0)
        pool = set(train_dataset._mode_index(Mode.Center)[:16].tolist())
        train_dataset.mode = Mode.Full
        assert set(np.asarray(rays.rays).tolist()) <= pool


class TestRaycasterRender:
    def test_render_shapes_and_depth(self, train_dataset):
        from fourier_feature_nets_tpu.models import Voxels
        model = Voxels(side=8, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        caster = ffn.Raycaster(model)
        idx = jnp.asarray(train_dataset.index_pool()[:16])
        rays = train_dataset.sampler.sample(idx, None)
        result = caster.render(params, rays, include_depth=True)
        assert result.color.shape == (16, 3)
        assert result.alpha.shape == (16,)
        assert result.depth.shape == (16,)
        assert not np.isnan(np.asarray(result.color)).any()

    def test_opaque_model_renders_its_color(self, train_dataset):
        """A uniformly opaque red field must render red with alpha 1."""
        from fourier_feature_nets_tpu.models import Voxels
        model = Voxels(side=4, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        voxels = np.zeros((4, 4, 4, 4), np.float32)
        voxels[..., 0] = 20.0   # red logit -> sigmoid ~1
        voxels[..., 1:3] = -20.0
        voxels[..., 3] = 100.0  # very opaque
        params = {"voxels": jnp.asarray(voxels),
                  "bias": jnp.zeros(4)}
        caster = ffn.Raycaster(model)
        idx = jnp.asarray(train_dataset.index_pool()[:8])
        rays = train_dataset.sampler.sample(idx, None)
        result = caster.render(params, rays)
        color = np.asarray(result.color)
        np.testing.assert_allclose(color[:, 0], 1.0, atol=1e-2)
        np.testing.assert_allclose(color[:, 1:], 0.0, atol=1e-2)
        np.testing.assert_allclose(np.asarray(result.alpha), 1.0,
                                   atol=1e-2)

    def test_batched_render_matches_single(self, train_dataset):
        from fourier_feature_nets_tpu.models import Voxels
        model = Voxels(side=8, scale=1.0)
        params = model.init(jax.random.PRNGKey(1))
        caster = ffn.Raycaster(model)
        idx = jnp.asarray(train_dataset.index_pool()[:40])
        rays = train_dataset.sampler.sample(idx, None)
        whole = caster.render(params, rays, include_depth=True)
        chunked = caster.batched_render(params, rays, batch_size=16,
                                        include_depth=True)
        np.testing.assert_allclose(np.asarray(whole.color), chunked.color,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(whole.depth), chunked.depth,
                                   rtol=1e-4, atol=1e-5)

    def test_render_image_shape(self, train_dataset):
        from fourier_feature_nets_tpu.models import Voxels
        model = Voxels(side=8, scale=1.0)
        params = model.init(jax.random.PRNGKey(0))
        caster = ffn.Raycaster(model)
        image = caster.render_image(params, train_dataset.sampler, 0,
                                    batch_size=256)
        assert image.shape == (32, 32, 3)
        assert image.dtype == np.uint8


class TestSubsampleAndScalars:
    def test_rays_for_camera_honors_subsample_index(self, train_dataset):
        """The reference's rays_for_camera routes through get_rays and
        therefore honors subsample_index (ray_caster.py:436-442 uses
        it to keep scene-inspection queries small); regression for the
        port bypassing the filter."""
        full = train_dataset.rays_for_camera(0)
        pixels = {int(i) for i in
                  np.asarray(full.rays)[:8] % train_dataset.sampler
                  .rays_per_camera}
        train_dataset.subsample_index = pixels
        try:
            subset = train_dataset.rays_for_camera(0)
        finally:
            train_dataset.subsample_index = None
        got = {int(i) % train_dataset.sampler.rays_per_camera
               for i in np.asarray(subset.rays)}
        assert got <= pixels
        assert len(np.asarray(subset.rays)) <= len(pixels)
        assert len(np.asarray(subset.rays)) < len(np.asarray(full.rays))

    def test_get_rays_accepts_scalar_index(self, train_dataset):
        """Reference get_rays normalizes scalars
        (image_dataset.py:377-378)."""
        rays = train_dataset.get_rays(5, 0)
        assert np.asarray(rays.positions).ndim == 3
