"""Ray dataset protocol.

TPU re-design of the reference dataset contract
(/root/reference/fourier_feature_nets/ray_dataset.py). Key changes:

  * ``loss``/``render`` are pure device functions operating on ray
    index arrays (fixed shapes, jit-safe) instead of Python lists.
  * Sampling modes are precomputed host-side int32 index pools rather
    than per-call list comprehensions; ``index_pool(mode)`` returns
    the global ray ids a trainer may draw batches from.
"""

import enum
from abc import ABC, abstractmethod
from typing import List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..cameras import CameraInfo
from ..render.ray_sampler import RaySamples

__all__ = ["Mode", "RayDataset", "RenderResult"]


class RenderResult(NamedTuple):
    """Per-ray rendering output (utils.py:506-528 parity)."""

    color: jnp.ndarray
    alpha: Optional[jnp.ndarray]
    depth: Optional[jnp.ndarray]

    def numpy(self) -> "RenderResult":
        """Converts all tensors to NumPy."""
        return RenderResult(*[None if t is None else np.asarray(t)
                              for t in self])


class Mode(enum.Enum):
    """Sampling mode of a dataset (ray_dataset.py:20-35)."""

    Full = 0
    Sparse = 1
    Center = 2
    Dilate = 3
    Patch = 4


class RayDataset(ABC):
    """Contract for datasets that produce rays for volume rendering."""

    Mode = Mode

    @property
    @abstractmethod
    def num_cameras(self) -> int:
        """Number of cameras in the dataset."""

    @property
    @abstractmethod
    def num_samples(self) -> int:
        """Samples per ray."""

    @property
    @abstractmethod
    def color_space(self) -> str:
        """Color space used by the dataset."""

    @property
    @abstractmethod
    def label(self) -> str:
        """Human-readable dataset label."""

    @property
    @abstractmethod
    def cameras(self) -> List[CameraInfo]:
        """Camera calibration list."""

    @property
    @abstractmethod
    def images(self) -> np.ndarray:
        """Source images."""

    @property
    @abstractmethod
    def mode(self) -> Mode:
        """Active sampling mode."""

    @mode.setter
    @abstractmethod
    def mode(self, value: Mode):
        """Sets the sampling mode."""

    @abstractmethod
    def index_pool(self, mode: Optional[Mode] = None) -> np.ndarray:
        """Global *valid* ray ids available under the given mode."""

    @abstractmethod
    def get_rays(self, idx, step: int = None,
                 rng=None) -> RaySamples:
        """Samples the given dataset-local ray indices."""

    @abstractmethod
    def render(self, rays: jnp.ndarray) -> RenderResult:
        """Ground-truth colors for global ray ids (device gather)."""

    @abstractmethod
    def loss(self, rays: jnp.ndarray, render: RenderResult) -> jnp.ndarray:
        """Training loss of a prediction against ground truth."""

    @abstractmethod
    def index_for_camera(self, camera: int) -> np.ndarray:
        """Valid per-camera pixel indices under the active mode."""

    @abstractmethod
    def rays_for_camera(self, camera: int) -> RaySamples:
        """Ray samples for one camera under the active mode."""

    @abstractmethod
    def to_valid(self, idx) -> np.ndarray:
        """Filters global ray ids to those hitting the volume."""

    @abstractmethod
    def __len__(self) -> int:
        """Number of rays under the active mode."""

    @abstractmethod
    def subset(self, cameras: List[int], num_samples: int,
               stratified: bool, label: str) -> "RayDataset":
        """Creates a camera-subset dataset."""

    def to_image(self, camera: int, colors: np.ndarray) -> np.ndarray:
        """Scatters mode-aware ray colors into an (H, W, 3) uint8 image
        (ray_dataset.py:159-183 parity)."""
        colors = np.asarray(colors)
        if colors.ndim == 1:
            colors = colors[..., np.newaxis]
        resolution = self.cameras[camera].resolution
        pixels = np.zeros((resolution.width * resolution.height, 3),
                          np.float32)
        pixels[self.index_for_camera(camera)] = colors
        pixels = pixels.reshape(resolution.height, resolution.width, 3)
        pixels = (pixels * 255).astype(np.uint8)
        if self.color_space == "YCrCb":
            import cv2
            pixels = cv2.cvtColor(pixels, cv2.COLOR_YCrCb2RGB)
        return pixels

    def sample_cameras(self, num_cameras: int, num_samples: int,
                       stratified: bool) -> "RayDataset":
        """Selects a farthest-point camera subset
        (ray_dataset.py:185-216 parity)."""
        if self.num_cameras < num_cameras:
            samples = list(range(self.num_cameras))
        else:
            positions = np.concatenate([cam.position
                                        for cam in self.cameras])
            chosen = {0}
            while len(chosen) < num_cameras:
                sample_positions = positions[sorted(chosen)]
                distances = positions[:, None, :] - sample_positions[None]
                distances = np.square(distances).sum(-1).min(-1)
                unchosen = np.array(sorted(
                    set(range(len(positions))) - chosen))
                chosen.add(int(unchosen[distances[unchosen].argmax()]))
            samples = sorted(chosen)
        return self.subset(samples, num_samples, stratified, self.label)
