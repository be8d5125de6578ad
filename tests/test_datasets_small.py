"""Golden unit tests for PixelDataset / SignalDataset semantics and
the load_model asset fallback.

Parity targets: reference pixel_dataset.py:45-104 (UV range, center
crop, train/val split), signal_dataset.py:40-68 (sample_rate split),
utils.py:448-477 (load_model auto-download of known assets).
"""

import os

import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.datasets.pixel_dataset import PixelDataset
from fourier_feature_nets_tpu.datasets.signal_dataset import SignalDataset

cv2 = pytest.importorskip("cv2")


def _write_image(path, pixels_rgb):
    cv2.imwrite(path, cv2.cvtColor(pixels_rgb, cv2.COLOR_RGB2BGR))


class TestPixelDataset:
    def test_uv_grids_span_zero_to_two(self, tmp_path):
        """UVs span [0, 2) with spacing 2/size (pixel_dataset.py:90-99)."""
        size = 8
        img = np.arange(size * size * 3, dtype=np.uint8).reshape(
            size, size, 3)
        path = str(tmp_path / "img.png")
        _write_image(path, img)
        ds = PixelDataset.create(path, "RGB", size)

        val_uv = np.asarray(ds.val_uv)
        assert val_uv.shape == (size, size, 2)
        assert val_uv.min() == 0.0
        assert val_uv.max() == pytest.approx(2.0 - 2.0 / size)
        np.testing.assert_allclose(val_uv[0, :, 0],
                                   np.arange(size) * 2.0 / size)

        train_uv = np.asarray(ds.train_uv)
        assert train_uv.shape == (size // 2, size // 2, 2)
        assert train_uv.max() == pytest.approx(2.0 - 4.0 / size)

        gen = np.asarray(PixelDataset.generate_uvs(4))
        np.testing.assert_allclose(np.unique(gen), [0.0, 0.5, 1.0, 1.5])

    def test_train_split_every_other_pixel(self, tmp_path):
        """Train colors are pixels[::2, ::2]; val is the full image
        (pixel_dataset.py:100-104)."""
        size = 8
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        path = str(tmp_path / "img.png")
        _write_image(path, img)
        ds = PixelDataset.create(path, "RGB", size)

        val = np.asarray(ds.val_color)
        train = np.asarray(ds.train_color)
        np.testing.assert_allclose(val, img / 255.0, atol=1e-6)
        np.testing.assert_allclose(train, val[::2, ::2], atol=1e-6)

    def test_center_crop_non_square(self, tmp_path):
        """A wide image is center-cropped to square before resizing
        (pixel_dataset.py:58-66)."""
        h, w = 8, 16
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :4] = 255      # left strip: cropped away
        img[:, 4:12] = 128    # center square: kept
        path = str(tmp_path / "wide.png")
        _write_image(path, img)
        ds = PixelDataset.create(path, "RGB", h)
        val = np.asarray(ds.val_color)
        assert val.shape == (h, h, 3)
        np.testing.assert_allclose(val, 128 / 255.0, atol=1e-2)

        # tall image: crop rows instead
        tall = np.swapaxes(img, 0, 1)
        path = str(tmp_path / "tall.png")
        _write_image(path, tall)
        ds = PixelDataset.create(path, "RGB", h)
        np.testing.assert_allclose(np.asarray(ds.val_color),
                                   128 / 255.0, atol=1e-2)

    def test_psnr_of_ground_truth_is_capped(self, tmp_path):
        size = 8
        img = np.full((size, size, 3), 77, np.uint8)
        path = str(tmp_path / "img.png")
        _write_image(path, img)
        ds = PixelDataset.create(path, "RGB", size)
        assert ds.psnr(ds.val_color) == pytest.approx(100.0)


class TestSignalDataset:
    def test_sample_rate_split(self):
        """Val is the dense num_samples*sample_rate grid over [0, 2);
        train takes every sample_rate-th point (signal_dataset.py:40-68)."""
        num_samples, rate = 8, 4
        ds = SignalDataset.create(np.sin, num_samples, rate)

        val_x = np.asarray(ds.val_x).reshape(-1)
        train_x = np.asarray(ds.train_x).reshape(-1)
        assert val_x.shape == (num_samples * rate,)
        assert train_x.shape == (num_samples,)
        np.testing.assert_allclose(
            val_x, np.linspace(0, 2, num_samples * rate, endpoint=False),
            atol=1e-6)
        np.testing.assert_allclose(train_x, val_x[::rate], atol=1e-6)
        np.testing.assert_allclose(np.asarray(ds.train_y).reshape(-1),
                                   np.sin(train_x), atol=1e-6)
        # x limits stretch the val range by 1.1 about its midpoint
        lo, hi = ds.x_lim
        assert lo < 0.0 < hi and hi > val_x[-1]


class TestSyntheticImage:
    def test_generate_and_load(self, tmp_path):
        """The procedural image round-trips through PixelDataset and
        carries multi-frequency content (non-trivial spectrum)."""
        from fourier_feature_nets_tpu.datasets.synthetic import (
            generate_synthetic_image,
        )
        path = str(tmp_path / "synthetic.png")
        out = generate_synthetic_image(path, size=64)
        assert out == path and os.path.exists(path)

        ds = PixelDataset.create(path, "RGB", 64)
        assert ds is not None
        img = np.asarray(ds.val_color)
        assert img.shape == (64, 64, 3)
        assert img.min() >= 0.0 and img.max() <= 1.0
        # spectral content beyond DC + lowest band in every channel
        spec = np.abs(np.fft.fft2(img, axes=(0, 1)))
        high = spec[8:32, 8:32].sum(axis=(0, 1))
        assert (high > 1.0).all(), high

    def test_deterministic(self, tmp_path):
        from fourier_feature_nets_tpu.datasets.synthetic import (
            generate_synthetic_image,
        )
        import cv2
        a = str(tmp_path / "a.png")
        b = str(tmp_path / "b.png")
        generate_synthetic_image(a, size=32)
        generate_synthetic_image(b, size=32)
        np.testing.assert_array_equal(cv2.imread(a), cv2.imread(b))


class TestLoadModelAssets:
    def test_unknown_path_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ffn.load_model(str(tmp_path / "nope.npz"))

    def test_known_asset_offline_raises_with_name(self, monkeypatch,
                                                  tmp_path):
        """A known pretrained name triggers the download fallback and
        fails gracefully offline (utils.py:448-477 parity)."""
        from fourier_feature_nets_tpu.utils import assets

        assert "lego_800_nerf.pt" in assets.ASSETS
        monkeypatch.setattr(assets, "download_asset",
                            lambda name, path: False)
        monkeypatch.setenv("FFN_TPU_DATA_DIR", str(tmp_path))
        with pytest.raises(FileNotFoundError, match="lego_800_nerf.pt"):
            ffn.load_model("lego_800_nerf.pt")

    def test_known_asset_downloaded_is_loaded(self, monkeypatch,
                                              tmp_path):
        """When the downloader produces the file, load_model loads it
        from the cache."""
        from fourier_feature_nets_tpu.utils import assets

        model = ffn.FourierFeatureMLP(2, 3, None, None, [8, 3])
        params = model.init(__import__("jax").random.PRNGKey(0))

        def fake_download(name, path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            ffn.save_model(model, params, path)
            return True

        monkeypatch.setattr(assets, "download_asset", fake_download)
        monkeypatch.setenv("FFN_TPU_DATA_DIR", str(tmp_path))
        monkeypatch.setitem(assets.ASSETS, "tiny_test_model.npz", "x")
        loaded, loaded_params = ffn.load_model("tiny_test_model.npz")
        assert loaded.model_type == "fourier"
        np.testing.assert_allclose(
            np.asarray(loaded_params["layers"][0]["weight"]),
            np.asarray(params["layers"][0]["weight"]))


class TestResizeFilter:
    def test_downsampling_uses_area_averaging(self, tmp_path):
        """cv2.resize's third POSITIONAL arg is dst, not interpolation
        (the reference falls into this trap at pixel_dataset.py:81 and
        silently bilinear-resizes); the port must pass the keyword so
        downsampling truly area-averages."""
        # columns [0, 0, 0, 255] repeated: 4x area downscale averages
        # to ~64 per output pixel, while bilinear samples between two
        # zero columns and returns 0
        img = np.zeros((16, 16, 3), np.uint8)
        img[:, 3::4] = 255
        path = str(tmp_path / "stripes.png")
        _write_image(path, img)
        ds = PixelDataset.create(path, "RGB", 4)
        image = np.asarray(ds.image).astype(np.float32)
        assert abs(image.mean() - 64.0) < 4.0, image.mean()


def test_download_asset_leaves_no_partial_file(monkeypatch, tmp_path):
    """A mid-download failure must not leave a truncated file at the
    output path — later os.path.exists cache checks would treat it as
    a valid asset forever."""
    import sys
    import types

    from fourier_feature_nets_tpu.utils import assets

    class FlakyResponse:
        def raise_for_status(self):
            pass

        def iter_content(self, chunk_size):
            yield b"partial bytes"
            raise ConnectionError("connection dropped mid-stream")

    fake_requests = types.SimpleNamespace(
        get=lambda url, stream, timeout: FlakyResponse())
    monkeypatch.setitem(sys.modules, "requests", fake_requests)

    out = str(tmp_path / "asset.npz")
    name = next(iter(assets.ASSETS))
    assert assets.download_asset(name, out) is False
    assert not os.path.exists(out)
    assert not os.path.exists(out + ".partial")


def test_resolve_data_path_exact_scheme_match(tmp_path, monkeypatch):
    """A real file named synthetic_*.npz must NOT be hijacked by the
    'synthetic[:res]' scheme (exact split-on-colon match, not
    startswith)."""
    from fourier_feature_nets_tpu.cli.common import resolve_data_path

    path = str(tmp_path / "synthetic_800.npz")
    with open(path, "wb") as f:
        f.write(b"not an npz")
    assert resolve_data_path(path) == path

    # the scheme itself still generates into the cache
    monkeypatch.setenv("FFN_TPU_DATA_DIR", str(tmp_path / "cache"))
    out = resolve_data_path("synthetic:24")
    assert out.endswith("synthetic_24.npz") and os.path.exists(out)
