"""FactorizedVoxels (TensoRF-VM) model: exactness, IO, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.models import (
    FactorizedVoxels,
    Voxels,
    load_model,
    save_model,
)
from fourier_feature_nets_tpu.ops.grid_sample import grid_sample_3d


@pytest.fixture(scope="module")
def model():
    return FactorizedVoxels(side=12, scale=1.0, rank=4)


@pytest.fixture(scope="module")
def params(model):
    return model.init(jax.random.PRNGKey(3))


class TestExactness:
    def test_matches_trilinear_of_dense_grid(self, model, params, rng):
        """Multilinear separability: interpolating the factors equals
        trilinearly interpolating the materialized dense grid."""
        pts = jnp.asarray(rng.uniform(-0.95, 0.95, (500, 3))
                          .astype(np.float32))
        got = model.apply(params, pts)
        dense = model.dense_grid(params)  # (x, y, z, 4)
        # grid_sample_3d expects (D=z, H=y, W=x, C) with (x, y, z) coords
        want = grid_sample_3d(jnp.transpose(dense, (2, 1, 0, 3)), pts)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_border_clamp(self, model, params):
        """Queries outside the volume saturate like border padding."""
        inside = jnp.asarray([[0.999, 0.0, 0.0]], jnp.float32)
        outside = jnp.asarray([[5.0, 0.0, 0.0]], jnp.float32)
        edge = model.apply(params, jnp.asarray([[1.0, 0.0, 0.0]],
                                               jnp.float32))
        far = model.apply(params, outside)
        np.testing.assert_allclose(np.asarray(far), np.asarray(edge),
                                   rtol=1e-5, atol=1e-6)
        assert np.isfinite(np.asarray(model.apply(params, inside))).all()

    def test_grid_point_values(self, model, params):
        """At exact cell centers the field equals the dense grid."""
        side = model.side
        cells = np.array([[2, 5, 7], [0, 0, 0],
                          [side - 1, side - 1, side - 1]], np.int64)
        coords = ((cells + 0.5) / side * 2.0 - 1.0).astype(np.float32)
        got = np.asarray(model.apply(params, jnp.asarray(coords)))
        dense = np.asarray(model.dense_grid(params))
        want = dense[cells[:, 0], cells[:, 1], cells[:, 2]]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestIO:
    def test_round_trip(self, model, params, tmp_path):
        path = str(tmp_path / "fv.npz")
        save_model(model, params, path)
        loaded_model, loaded_params = load_model(path)
        assert isinstance(loaded_model, FactorizedVoxels)
        assert loaded_model.params_manifest == model.params_manifest
        pts = jnp.asarray([[0.3, -0.2, 0.5]], jnp.float32)
        np.testing.assert_allclose(
            np.asarray(model.apply(params, pts)),
            np.asarray(loaded_model.apply(loaded_params, pts)))


class TestTraining:
    def test_fits_synthetic_scene_better_than_dense_at_equal_steps(
            self, tmp_path_factory):
        """A short fit converges, and the factorized field trains at
        least as well as the dense grid under the same tiny budget."""
        from fourier_feature_nets_tpu.datasets.synthetic import (
            generate_synthetic_dataset,
        )
        path = tmp_path_factory.mktemp("fv") / "scene.npz"
        generate_synthetic_dataset(str(path), resolution=24,
                                   split_counts=(3, 1, 1),
                                   volume_side=16, num_samples=64)
        train = ffn.ImageDataset.load(str(path), "train", num_samples=32)
        val = train.sample_cameras(1, 32, False)

        def fit(model):
            caster = ffn.Raycaster(model)
            params = model.init(jax.random.PRNGKey(0))
            params, log = caster.fit(
                params, train, val, batch_size=256, learning_rate=0.01,
                num_steps=150, crop_steps=0, report_interval=150,
                decay_rate=0.9, decay_steps=25000)
            return log[-1].train_psnr

        scale = float(train.sampler.bounds[0, 0]) / 2.0
        psnr_fact = fit(FactorizedVoxels(16, scale, rank=8))
        psnr_dense = fit(Voxels(16, scale))
        assert np.isfinite(psnr_fact)
        assert psnr_fact > 14.0, psnr_fact
        assert psnr_fact > psnr_dense - 3.0, (psnr_fact, psnr_dense)


class TestRendering:
    def test_renders_through_render_frame(self, model, params):
        from fourier_feature_nets_tpu.cameras import Resolution
        from fourier_feature_nets_tpu.render import RaySampler
        from fourier_feature_nets_tpu.utils.camera_paths import orbit
        cameras = orbit(np.array([0.0, 1.0, 0.0]),
                        np.array([0.0, 0.0, 1.0]), 2, 40.0,
                        Resolution(16, 16), 3.0)
        bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
        sampler = RaySampler(bounds, cameras, num_samples=8)
        caster = ffn.Raycaster(model)
        image = caster.render_frame(params, sampler, 0, chunk_size=64)
        assert image.shape == (16, 16, 3)
        assert np.isfinite(image).all()
