"""Multi-view image dataset for training radiance fields.

TPU re-design of the reference image dataset
(/root/reference/fourier_feature_nets/image_dataset.py). Ground-truth
colors/alphas live as device arrays gathered inside the jitted train
step; sampling modes (Full/Sparse/Center/Dilate) are precomputed
host-side index pools — already filtered to valid rays — from which
trainers draw fixed-shape batches.
"""

import os
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..cameras import CameraInfo, Resolution, pixel_grid
from ..render.ray_sampler import RaySampler, RaySamples
from ..utils.assets import default_data_dir, download_asset
from .ray_dataset import Mode, RayDataset, RenderResult

__all__ = ["ImageDataset"]


class ImageDataset(RayDataset):
    """Dataset of posed RGBA images for ray-based training."""

    def __init__(self, label: str, images: np.ndarray, bounds: np.ndarray,
                 cameras: List[CameraInfo], num_samples: int,
                 include_alpha: bool = True, stratified: bool = False,
                 opacity_model=None, opacity_params=None,
                 batch_size: int = 4096, color_space: str = "RGB",
                 sparse_size: int = 50, anneal_start: float = 0.2,
                 num_anneal_steps: int = 0, alpha_weight: float = 0.1):
        assert images.ndim == 4
        assert len(images) == len(cameras)
        assert images.dtype == np.uint8

        self._color_space = color_space
        self._mode = Mode.Full
        self._label = label
        self._images = images
        self._subsample_index = None
        self.include_alpha = include_alpha
        self.image_height, self.image_width = images.shape[1:3]
        self.sparse_size = sparse_size

        self.sampler = RaySampler(bounds, cameras, num_samples, stratified,
                                  opacity_model, opacity_params, batch_size,
                                  anneal_start, num_anneal_steps)

        points = pixel_grid(cameras[0].resolution)
        rays_per_camera = self.sampler.rays_per_camera

        # center crop: middle half of the image (image_dataset.py:77-90)
        source_resolution = np.array([self.image_width, self.image_height])
        crop_start = source_resolution // 4
        crop_end = source_resolution - crop_start
        inside_crop = ((points >= crop_start) & (points < crop_end)).all(-1)
        crop_points = np.nonzero(inside_crop)[0]
        self.crop_rays_per_camera = len(crop_points)

        # sparse grid (image_dataset.py:92-97)
        sparse_points = self._subsample_rays(sparse_size)
        self.sparse_rays_per_camera = len(sparse_points)

        # patch grid: the reference DECLARES Patch mode but never
        # implements it (ray_dataset.py:34, raises at
        # image_dataset.py:293). Here it works: pixels ordered
        # patch-major so that contiguous ray batches cover whole
        # patches (useful for patch/perceptual losses).
        self.patch_size = 8
        patch_points = self._patch_rays(self.patch_size)
        self.patch_rays_per_camera = len(patch_points)

        # alpha-mask dilation stencil (image_dataset.py:99-101)
        stencil_radius = 8 * min(self.image_width, self.image_height) // 100
        stencil_size = 2 * stencil_radius + 1

        colors = []
        alphas = []
        crop_index = []
        sparse_index = []
        patch_index = []
        dilate_index = []
        self.dilate_ranges = []
        num_dilate = 0
        has_alpha = images.shape[-1] == 4

        for cam, image in enumerate(images):
            color = image[..., :3]
            if color_space == "YCrCb":
                import cv2
                color = cv2.cvtColor(color, cv2.COLOR_RGB2YCrCb)
            color = color.astype(np.float32) / 255
            colors.append(color[points[:, 1], points[:, 0]])

            offset = cam * rays_per_camera
            if has_alpha:
                alpha = image[..., 3].astype(np.float32) / 255
                alphas.append(alpha[points[:, 1], points[:, 0]])

                import cv2
                mask = (image[..., 3] > 0).astype(np.uint8)
                element = cv2.getStructuringElement(
                    cv2.MORPH_ELLIPSE, (stencil_size, stencil_size))
                mask = cv2.dilate(mask, element)
                mask = mask[points[:, 1], points[:, 0]]
                dilate_points = np.nonzero(mask)[0]
                dilate_index.append(dilate_points + offset)
                self.dilate_ranges.append(
                    (num_dilate, num_dilate + len(dilate_points)))
                num_dilate += len(dilate_points)

            crop_index.append(crop_points + offset)
            sparse_index.append(sparse_points + offset)
            patch_index.append(patch_points + offset)

        self.crop_index = np.concatenate(crop_index)
        self.sparse_index = np.concatenate(sparse_index)
        self.patch_index = np.concatenate(patch_index)
        self.dilate_index = (np.concatenate(dilate_index)
                             if dilate_index else np.array([], np.int64))

        self.colors = jnp.asarray(np.concatenate(colors))
        if has_alpha and include_alpha:
            self.alphas = jnp.asarray(np.concatenate(alphas))
            self.alpha_weight = alpha_weight
        else:
            self.alphas = None
            self.alpha_weight = 0.0

        # valid-filtered index pools per mode (computed lazily)
        self._pools = {}

    # ------------------------------------------------------------------
    # protocol properties
    # ------------------------------------------------------------------

    @property
    def color_space(self) -> str:
        """Color space used by the dataset."""
        return self._color_space

    @property
    def label(self) -> str:
        """Dataset label."""
        return self._label

    @property
    def images(self) -> np.ndarray:
        """Source images."""
        return self._images

    @property
    def mode(self) -> Mode:
        """Active sampling mode."""
        return self._mode

    @mode.setter
    def mode(self, value: Mode):
        if value == Mode.Dilate and len(self.dilate_index) == 0:
            raise ValueError(
                "Unable to use dilate mode: missing alpha channel")
        self._mode = value

    @property
    def subsample_index(self):
        """Optional set of per-camera pixel indices to restrict
        sampling to (ray_dataset.py:81-89 parity; used by scene
        inspection paths)."""
        return self._subsample_index

    @subsample_index.setter
    def subsample_index(self, index):
        self._subsample_index = (None if index is None
                                 else set(int(i) for i in index))

    @property
    def num_cameras(self) -> int:
        """Number of cameras."""
        return self.sampler.num_cameras

    @property
    def num_samples(self) -> int:
        """Samples per ray."""
        return self.sampler.num_samples

    @property
    def cameras(self) -> List[CameraInfo]:
        """Camera list."""
        return self.sampler.cameras

    # ------------------------------------------------------------------
    # index pools
    # ------------------------------------------------------------------

    def _mode_index(self, mode: Mode) -> np.ndarray:
        if mode == Mode.Center:
            return self.crop_index
        if mode == Mode.Sparse:
            return self.sparse_index
        if mode == Mode.Dilate:
            return self.dilate_index
        if mode == Mode.Patch:
            return self.patch_index
        if mode == Mode.Full:
            return np.arange(self.sampler.num_rays)
        raise NotImplementedError("Unsupported sampling mode")

    def index_pool(self, mode: Optional[Mode] = None) -> np.ndarray:
        """Valid global ray ids available under ``mode`` (cached)."""
        mode = self._mode if mode is None else mode
        if mode not in self._pools:
            self._pools[mode] = self.sampler.to_valid(
                self._mode_index(mode))
        return self._pools[mode]

    def to_valid(self, idx) -> np.ndarray:
        """Filters global ray ids by volume intersection."""
        return self.sampler.to_valid(idx)

    def __len__(self) -> int:
        """Number of rays (valid or not) under the active mode
        (image_dataset.py:317-331 parity)."""
        if self._mode == Mode.Full:
            # _mode_index would allocate a fresh ~num_rays arange
            # (~143 MB at 800px/28 cams) just to take its length
            return self.sampler.num_rays
        return len(self._mode_index(self._mode))

    # ------------------------------------------------------------------
    # ray access
    # ------------------------------------------------------------------

    def get_rays(self, idx, step: int = None, rng=None) -> RaySamples:
        """Samples dataset-local indices under the active mode.

        Local indices are remapped through the mode's index table then
        filtered to valid rays (image_dataset.py:364-386).
        """
        # scalars are promoted like the reference's list-normalization
        # (image_dataset.py:377-378) — 0-d arrays would crash the
        # boolean filters below
        idx = np.atleast_1d(np.asarray(idx))
        if self._mode != Mode.Full:
            idx = self._mode_index(self._mode)[idx]
        if self._subsample_index:
            keep = np.isin(idx % self.sampler.rays_per_camera,
                           np.fromiter(self._subsample_index, np.int64))
            idx = idx[keep]
        idx = self.sampler.to_valid(idx)
        return self.sampler.sample(jnp.asarray(idx), step, rng)

    def index_for_camera(self, camera: int) -> np.ndarray:
        """Per-camera pixel indices (into the camera's pixel grid) of
        the valid rays under the active mode (image_dataset.py:264-297)."""
        camera_start = camera * self.sampler.rays_per_camera
        if self._mode == Mode.Dilate:
            start, end = self.dilate_ranges[camera]
            idx = self.dilate_index[start:end]
        elif self._mode == Mode.Full:
            idx = np.arange(camera_start,
                            camera_start + self.sampler.rays_per_camera)
        elif self._mode == Mode.Center:
            start = camera * self.crop_rays_per_camera
            idx = self.crop_index[start:start + self.crop_rays_per_camera]
        elif self._mode == Mode.Sparse:
            start = camera * self.sparse_rays_per_camera
            idx = self.sparse_index[
                start:start + self.sparse_rays_per_camera]
        elif self._mode == Mode.Patch:
            start = camera * self.patch_rays_per_camera
            idx = self.patch_index[
                start:start + self.patch_rays_per_camera]
        else:
            raise NotImplementedError("Unsupported sampling mode")
        idx = self.sampler.to_valid(idx)
        return idx - camera_start

    def rays_for_camera(self, camera: int) -> RaySamples:
        """Ray samples for one camera under the active mode.

        Honors ``subsample_index`` like the reference (its
        rays_for_camera routes through get_rays,
        image_dataset.py:300-315) — scene-inspection consumers set a
        sparse pixel set precisely so per-camera queries stay small
        (ray_caster.py:436-442)."""
        idx = self.index_for_camera(camera)
        if self._subsample_index:
            keep = np.isin(idx, np.fromiter(self._subsample_index,
                                            np.int64))
            idx = idx[keep]
        idx = idx + camera * self.sampler.rays_per_camera
        return self.sampler.sample(jnp.asarray(idx), None)

    # ------------------------------------------------------------------
    # ground truth + loss (device)
    # ------------------------------------------------------------------

    def render(self, rays: jnp.ndarray) -> RenderResult:
        """Ground-truth colors/alphas for global ray ids.

        In Dilate mode alpha supervision is disabled and background
        pixels keep their colors (image_dataset.py:244-262).
        """
        color = self.colors[rays]
        if self.alphas is None or self._mode == Mode.Dilate:
            return RenderResult(color, None, None)
        alpha = self.alphas[rays]
        color = jnp.where(alpha[:, None] > 0, color,
                          jnp.zeros_like(color))
        return RenderResult(color, alpha, None)

    def loss(self, rays: jnp.ndarray, render: RenderResult) -> jnp.ndarray:
        """MSE(color) + alpha_weight * MSE(alpha)
        (image_dataset.py:224-242)."""
        actual = self.render(rays)
        color_loss = jnp.mean(jnp.square(actual.color - render.color))
        if self.alpha_weight > 0 and actual.alpha is not None:
            alpha_loss = jnp.mean(jnp.square(actual.alpha - render.alpha))
            return color_loss + self.alpha_weight * alpha_loss
        return color_loss

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    def _patch_rays(self, patch_size: int) -> np.ndarray:
        """Pixel indices reordered patch-major: consecutive runs of
        patch_size**2 indices tile one square patch."""
        height = (self.image_height // patch_size) * patch_size
        width = (self.image_width // patch_size) * patch_size
        ys, xs = np.meshgrid(np.arange(height), np.arange(width),
                             indexing="ij")
        order = np.lexsort((xs.reshape(-1) % patch_size,
                            ys.reshape(-1) % patch_size,
                            xs.reshape(-1) // patch_size,
                            ys.reshape(-1) // patch_size))
        flat = (ys.reshape(-1) * self.image_width
                + xs.reshape(-1))[order]
        return flat.astype(np.int64)

    def _subsample_rays(self, resolution: int) -> np.ndarray:
        """Sparse pixel grid indices (image_dataset.py:473-482)."""
        num_x = resolution * self.image_width // self.image_height
        num_y = resolution
        x_vals = np.linspace(0, self.image_width - 1, num_x) + 0.5
        y_vals = np.linspace(0, self.image_height - 1, num_y) + 0.5
        x_vals, y_vals = np.meshgrid(x_vals.astype(np.int32),
                                     y_vals.astype(np.int32))
        return (y_vals.reshape(-1) * self.image_width
                + x_vals.reshape(-1)).astype(np.int64)

    def subset(self, cameras: List[int], num_samples: int,
               stratified: bool, label: str) -> "ImageDataset":
        """Camera-subset dataset (image_dataset.py:333-362)."""
        return ImageDataset(label, self._images[cameras],
                            self.sampler.bounds,
                            [self.sampler.cameras[i] for i in cameras],
                            num_samples, self.include_alpha, stratified,
                            self.sampler.opacity_model,
                            self.sampler.opacity_params,
                            self.sampler.batch_size, self._color_space,
                            self.sparse_size, self.sampler.anneal_start,
                            self.sampler.num_anneal_steps,
                            self.alpha_weight)

    def to_scenepic(self):
        """Ray-sampling inspection scene (optional scenepic dep);
        PNG-based alternative: cli/inspect_ray_sampling."""
        from ..scenepic_io import dataset_to_scenepic
        return dataset_to_scenepic(self)

    @staticmethod
    def load(path: str, split: str, num_samples: int,
             include_alpha: bool = True, stratified: bool = False,
             opacity_model=None, opacity_params=None,
             batch_size: int = 4096, color_space: str = "RGB",
             sparse_size: int = 50, anneal_start: float = 0.2,
             num_anneal_steps: int = 0) -> Optional["ImageDataset"]:
        """Loads a dataset split from an NPZ file.

        NPZ schema (image_dataset.py:395-405): images (C,R,R,[3|4]) u8,
        bounds (4,4), intrinsics (C,3,3), extrinsics (C,4,4),
        split_counts (3,) in train/val/test order. Unknown paths are
        resolved against the data cache and downloaded when possible.
        """
        if not os.path.exists(path):
            cache_path = os.path.join(default_data_dir(),
                                      os.path.basename(path))
            if not os.path.exists(cache_path):
                print("Downloading dataset...")
                if not download_asset(os.path.basename(path), cache_path):
                    print("Unable to download dataset", path)
                    return None
            path = cache_path

        data = np.load(path)
        test_end, height, width = data["images"].shape[:3]
        split_counts = data["split_counts"]
        train_end = int(split_counts[0])
        val_end = train_end + int(split_counts[1])

        if split == "train":
            idx = list(range(train_end))
        elif split == "val":
            idx = list(range(train_end, val_end))
        elif split == "test":
            idx = list(range(val_end, test_end))
        else:
            print("Unrecognized split:", split)
            return None

        bounds = data["bounds"]
        images = data["images"][idx]
        intrinsics = data["intrinsics"][idx]
        extrinsics = data["extrinsics"][idx]
        cameras = [CameraInfo.create("{}{:03}".format(split, i),
                                     Resolution(width, height), intr, extr)
                   for i, (intr, extr) in enumerate(zip(intrinsics,
                                                        extrinsics))]
        return ImageDataset(split, images, bounds, cameras, num_samples,
                            include_alpha, stratified, opacity_model,
                            opacity_params, batch_size, color_space,
                            sparse_size, anneal_start, num_anneal_steps)
