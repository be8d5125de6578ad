"""2-D pixel regression dataset.

TPU re-design of the reference pixel dataset
(/root/reference/fourier_feature_nets/pixel_dataset.py): image pixels
+ UV grids become device arrays so the full-batch train step runs as a
single jit. UVs intentionally span [0, 2) to match the 3D volume input
range the FFN expects (pixel_dataset.py:90-99).
"""

import math
import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = ["PixelData", "PixelDataset"]


class PixelData(NamedTuple):
    """UV coordinates in [0, 2) and corresponding colors in [0, 1]."""

    uv: jnp.ndarray
    color: jnp.ndarray


class PixelDataset:
    """Dataset of image pixels for 2-D regression."""

    def __init__(self, size: int, color_space: str,
                 train_data: PixelData, val_data: PixelData):
        self.size = size
        self.color_space = color_space
        self.train_uv, self.train_color = train_data
        self.val_uv, self.val_color = val_data
        self.image = self.to_image(self.val_color)

    @staticmethod
    def create(path: str, color_space: str, size=512,
               data_dir: str = None) -> "PixelDataset":
        """Creates a dataset from an image file.

        Center-crops to square, resizes to ``size``, converts to the
        requested color space, and builds the train (every other
        pixel, half-res UV grid) and val (full res) splits
        (pixel_dataset.py:45-104).
        """
        import cv2

        if not os.path.exists(path) and data_dir:
            path = os.path.join(data_dir, path)

        pixels = cv2.imread(path)
        if pixels is None:
            print("Unable to load image at", path)
            return None

        if pixels.shape[0] > pixels.shape[1]:
            start = (pixels.shape[0] - pixels.shape[1]) // 2
            pixels = pixels[start:start + pixels.shape[1], :]
        elif pixels.shape[1] > pixels.shape[0]:
            start = (pixels.shape[1] - pixels.shape[0]) // 2
            pixels = pixels[:, start:start + pixels.shape[0]]

        if pixels.shape[0] != size:
            # NOTE: must be the KEYWORD — the third positional slot of
            # cv2.resize is dst, so the reference's positional
            # INTER_AREA (pixel_dataset.py:81) is silently ignored and
            # it actually resizes with bilinear; area averaging is the
            # correct downsampling filter (no aliasing)
            pixels = cv2.resize(pixels, (size, size),
                                interpolation=cv2.INTER_AREA)

        if color_space == "YCrCb":
            pixels = cv2.cvtColor(pixels, cv2.COLOR_BGR2YCrCb) / 255
        elif color_space == "RGB":
            pixels = cv2.cvtColor(pixels, cv2.COLOR_BGR2RGB) / 255
        else:
            raise NotImplementedError(
                "Unsupported color space: {}".format(color_space))

        pixels = pixels.astype(np.float32)

        vals = np.linspace(0, 2, size // 2, endpoint=False,
                           dtype=np.float32)
        train_uv = np.stack(np.meshgrid(vals, vals), axis=-1)
        train_color = pixels[::2, ::2, :]

        vals = np.linspace(0, 2, size, endpoint=False, dtype=np.float32)
        val_uv = np.stack(np.meshgrid(vals, vals), axis=-1)

        train = PixelData(jnp.asarray(train_uv), jnp.asarray(train_color))
        val = PixelData(jnp.asarray(val_uv), jnp.asarray(pixels))
        return PixelDataset(size, color_space, train, val)

    def to(self, *args) -> "PixelDataset":
        """API-compat no-op: data is device-resident already
        (pixel_dataset.py:106-114 moves tensors in the reference)."""
        del args
        return self

    @staticmethod
    def generate_uvs(size: int) -> jnp.ndarray:
        """(size, size, 2) UV grid spanning [0, 2)."""
        vals = np.linspace(0, 2, size, endpoint=False, dtype=np.float32)
        return jnp.asarray(np.stack(np.meshgrid(vals, vals), axis=-1))

    def to_image(self, colors, size=0) -> np.ndarray:
        """Converts predicted colors to an RGB uint8 image
        (pixel_dataset.py:153-172)."""
        if size == 0:
            size = self.size
        pixels = np.asarray(colors).reshape(size, size, 3)
        pixels = (pixels * 255).astype(np.uint8)
        if self.color_space == "YCrCb":
            import cv2
            pixels = cv2.cvtColor(pixels, cv2.COLOR_YCrCb2RGB)
        return pixels

    def to_act_image(self, model, params, size: int) -> np.ndarray:
        """Renders an 8x8 grid of output-layer basis images
        (pixel_dataset.py:116-151)."""
        num_grid = 8
        grid_size = size // num_grid
        uvs = self.generate_uvs(grid_size).reshape(-1, 2)
        _, activation = model.apply(params, uvs, return_hidden=True)
        activation = np.asarray(activation).T[..., np.newaxis]

        out_layer = params["layers"][-1]
        palette = np.asarray(out_layer["weight"])[:, np.newaxis, :]
        bias = np.asarray(out_layer["bias"])
        values = 1.0 / (1.0 + np.exp(-(activation * palette + bias)))

        act_pixels = np.zeros((size, size, 3), np.float32)
        for i in range(num_grid):
            for j in range(num_grid):
                unit = values[i * num_grid + j]
                act_pixels[i * grid_size:(i + 1) * grid_size,
                           j * grid_size:(j + 1) * grid_size] = (
                    unit.reshape(grid_size, grid_size, 3))

        act_pixels = (act_pixels * 255).astype(np.uint8)
        if self.color_space == "YCrCb":
            import cv2
            act_pixels = cv2.cvtColor(act_pixels, cv2.COLOR_YCrCb2RGB)
        return act_pixels

    def psnr(self, colors) -> float:
        """PSNR of predicted colors vs validation pixels
        (pixel_dataset.py:189-199)."""
        mse = float(jnp.mean(jnp.square(jnp.asarray(colors).reshape(
            self.val_color.shape) - self.val_color)))
        # guard the perfect-reconstruction case (log10(0))
        return -10 * math.log10(max(mse, 1e-10))
