"""Color-space handling and inverse-CDF bin sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.datasets.synthetic import (
    generate_synthetic_dataset,
)
from fourier_feature_nets_tpu.ops.sampling import inverse_cdf_from_bins


class TestInverseCdfFromBins:
    def test_uniform_cdf_recovers_edges(self):
        edges = jnp.asarray([[1.0, 2.0, 3.0, 5.0]])
        cdf = jnp.asarray([[0.0, 0.25, 0.5, 1.0]])
        t = np.asarray(inverse_cdf_from_bins(edges, cdf, 5))[0]
        np.testing.assert_allclose(t, [1.0, 2.0, 3.0, 4.0, 5.0],
                                   atol=1e-5)

    def test_point_mass_bin(self):
        edges = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
        cdf = jnp.asarray([[0.0, 0.001, 0.999, 1.0]])
        t = np.asarray(inverse_cdf_from_bins(
            edges, cdf, 64, jax.random.PRNGKey(0)))[0]
        assert ((t >= 1.0) & (t <= 2.0)).mean() > 0.95


class TestYCrCb:
    @pytest.fixture(scope="class")
    def scene_path(self, tmp_path_factory):
        path = tmp_path_factory.mktemp("data") / "scene.npz"
        return generate_synthetic_dataset(str(path), resolution=24,
                                          split_counts=(2, 1, 1),
                                          volume_side=16,
                                          num_samples=64)

    def test_ycrcb_dataset_roundtrip(self, scene_path):
        import cv2
        rgb = ffn.ImageDataset.load(scene_path, "train", num_samples=8,
                                    color_space="RGB")
        ycc = ffn.ImageDataset.load(scene_path, "train", num_samples=8,
                                    color_space="YCrCb")
        # stored colors differ (different spaces)...
        assert not np.allclose(np.asarray(rgb.colors),
                               np.asarray(ycc.colors))
        # ...but to_image converts YCrCb back to comparable RGB
        idx = ycc.index_for_camera(0)
        colors_ycc = np.asarray(ycc.colors[
            jnp.asarray(idx + 0 * idx)])
        img_ycc = ycc.to_image(0, colors_ycc)
        colors_rgb = np.asarray(rgb.colors[jnp.asarray(idx)])
        img_rgb = rgb.to_image(0, colors_rgb)
        # cv2 YCrCb conversion is lossy at u8: tolerance in levels
        diff = np.abs(img_ycc.astype(int) - img_rgb.astype(int))
        assert diff.mean() < 6, diff.mean()

    def test_pixel_dataset_ycrcb(self):
        import cv2
        rng = np.random.default_rng(0)
        image = rng.integers(0, 255, (64, 64, 3), np.uint8)
        path = "/tmp/ffn_test_ycc.png"
        cv2.imwrite(path, image)
        ds = ffn.PixelDataset.create(path, "YCrCb", 32)
        assert ds.color_space == "YCrCb"
        assert ds.image.shape == (32, 32, 3)
        psnr = ds.psnr(ds.val_color)
        assert psnr >= 100  # identical colors (clamped)
