"""Training-loop visualization hooks.

TPU re-design of /root/reference/fourier_feature_nets/visualizers.py:
visualizers receive a ``render(samples, include_depth)`` callable that
runs the current parameters through the jitted chunked renderer, so
they never touch model state. All output is PNG frames via cv2.
"""

import os
from abc import ABC, abstractmethod
from typing import Callable

import numpy as np

from .cameras import Resolution
from .datasets.image_dataset import ImageDataset
from .datasets.ray_dataset import RenderResult
from .render.ray_sampler import RaySampler, RaySamples
from .utils.camera_paths import orbit

__all__ = ["Visualizer", "EvaluationVisualizer", "OrbitVideoVisualizer",
           "ActivationVisualizer", "ComparisonVisualizer"]

ImageRender = Callable[[RaySamples, bool], RenderResult]
ActivationRender = Callable[[RaySampler, int], np.ndarray]


def _write_png(path: str, rgb: np.ndarray):
    import cv2
    cv2.imwrite(path, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))


class Visualizer(ABC):
    """Hook into the training process producing artifacts
    (visualizers.py:19-30)."""

    @abstractmethod
    def visualize(self, step: int, render: ImageRender,
                  act_render: ActivationRender):
        """Creates a visualization with the provided render functions."""

    def _due(self, step: int) -> bool:
        """True when ``step`` enters a new ``self._interval`` window.

        ``fit(steps_per_call=K)`` reports only the LAST step of each
        K-step chunk (99, 199, ...), so the reference's exact-multiple
        gate (``step % interval == 0``, visualizers.py:43) would never
        fire; interval-CROSSING semantics fire once per covered
        multiple and reduce to the reference's gate at K=1."""
        prev = getattr(self, "_prev_step", None)
        self._prev_step = step
        if prev is None:
            return step % self._interval == 0
        return step // self._interval > prev // self._interval


class EvaluationVisualizer(Visualizer):
    """2x2 grids of prediction / GT / depth / error
    (visualizers.py:33-102)."""

    def __init__(self, results_dir: str, dataset: ImageDataset,
                 interval: int, max_depth: float = 10):
        path = os.path.join(results_dir, dataset.label)
        os.makedirs(path, exist_ok=True)
        self._output_dir = path
        self._dataset = dataset
        self._interval = interval
        self._index = 0
        self._max_depth = max_depth

    def visualize(self, step: int, render: ImageRender,
                  _: ActivationRender):
        """Writes one evaluation grid if the step is on the interval."""
        if not self._due(step):
            return

        camera = self._index % self._dataset.num_cameras
        samples = self._dataset.rays_for_camera(camera)
        act = self._dataset.render(samples.rays).numpy()
        pred = render(samples, True)
        pred = RenderResult(np.asarray(pred.color), np.asarray(pred.alpha),
                            np.asarray(pred.depth))

        error = np.square(act.color - pred.color).sum(-1)
        if act.alpha is not None:
            error = (3 * error + np.square(act.alpha - pred.alpha)) / 4

        width, height = self._dataset.cameras[camera].resolution
        predicted_image = self._dataset.to_image(
            camera, np.clip(pred.color, 0, 1))
        if act.alpha is not None:
            gt_color = act.color * act.alpha[..., np.newaxis]
        else:
            gt_color = act.color
        actual_image = self._dataset.to_image(camera, gt_color)
        depth = np.clip(pred.depth, 0, self._max_depth) / self._max_depth
        depth_image = self._dataset.to_image(camera, depth)
        error = np.sqrt(error)
        error_image = self._dataset.to_image(
            camera, error / max(error.max(), 1e-8))

        compare = np.zeros((height * 2, width * 2, 3), np.uint8)
        compare[:height, :width] = predicted_image
        compare[height:, :width] = actual_image
        compare[:height, width:] = depth_image
        compare[height:, width:] = error_image

        name = "s{:07}_c{:03}.png".format(step, camera)
        _write_png(os.path.join(self._output_dir, name), compare)
        self._index += 1


class _OrbitRigVisualizer(Visualizer):
    """Shared setup for the orbit-video visualizers: a dedicated
    distance-4 / fov-40 orbit rig over bounds 2*I (the reference's
    construction, visualizers.py:116-128), one frame per interval."""

    def __init__(self, results_dir: str, subdir: str, num_steps: int,
                 resolution: Resolution, num_frames: int,
                 num_samples: int, color_space: str):
        out_dir = os.path.join(results_dir, subdir)
        os.makedirs(out_dir, exist_ok=True)
        self._output_dir = out_dir
        cameras = orbit(np.array([0.0, 1.0, 0.0]),
                        np.array([0.0, 0.0, -1.0]), num_frames, 40,
                        Resolution(*resolution).square(), 4)
        bounds = np.eye(4, dtype=np.float32) * 2
        self._sampler = RaySampler(bounds, cameras, num_samples)
        self._interval = max(1, num_steps // num_frames)
        self._index = 0
        self._color_space = color_space


class OrbitVideoVisualizer(_OrbitRigVisualizer):
    """One orbit frame per interval on a dedicated sampler
    (visualizers.py:105-152)."""

    def __init__(self, results_dir: str, num_steps: int,
                 resolution: Resolution, num_frames: int,
                 num_samples: int, color_space: str):
        super().__init__(results_dir, "video", num_steps, resolution,
                         num_frames, num_samples, color_space)

    def visualize(self, step: int, render: ImageRender,
                  _: ActivationRender):
        """Writes one orbit frame if the step is on the interval."""
        if not self._due(step):
            return
        camera = self._index % self._sampler.num_cameras
        samples = self._sampler.rays_for_camera(camera)
        pred = render(samples, False)
        image = self._sampler.to_image(camera, np.asarray(pred.color),
                                       self._color_space)
        name = "frame_{:05d}.png".format(self._index)
        _write_png(os.path.join(self._output_dir, name), image)
        self._index += 1


class ActivationVisualizer(_OrbitRigVisualizer):
    """Orbit video of the output-layer activation grid
    (visualizers.py:155-199)."""

    def __init__(self, results_dir: str, num_steps: int,
                 resolution: Resolution, num_frames: int,
                 num_samples: int, color_space: str):
        super().__init__(results_dir, "activations", num_steps,
                         resolution, num_frames, num_samples,
                         color_space)

    def visualize(self, step: int, _: ImageRender,
                  act_render: ActivationRender):
        """Writes one activation-grid frame if on the interval."""
        if not self._due(step):
            return
        image = act_render(self._sampler, self._index)
        name = "frame_{:05d}.png".format(self._index)
        _write_png(os.path.join(self._output_dir, name), image)
        self._index += 1


class ComparisonVisualizer(Visualizer):
    """Train-vs-val GT/prediction strips (visualizers.py:202-263)."""

    def __init__(self, results_dir: str, num_steps: int, num_frames: int,
                 train: ImageDataset, val: ImageDataset):
        compare_dir = os.path.join(results_dir, "compare")
        os.makedirs(compare_dir, exist_ok=True)
        assert train.num_cameras == val.num_cameras
        self._output_dir = compare_dir
        self._train = train
        self._val = val
        self._interval = max(1, num_steps // num_frames)
        self._index = 0

    def visualize(self, step: int, render: ImageRender,
                  _: ActivationRender):
        """Writes one comparison strip if on the interval."""
        if not self._due(step):
            return

        num_cameras = self._train.num_cameras
        resolution = self._train.cameras[0].resolution
        width = resolution.width * 4
        height = resolution.height * num_cameras
        frame = np.zeros((height, width, 3), np.uint8)
        c = [i * resolution.width for i in range(5)]
        for camera in range(num_cameras):
            r0 = camera * resolution.height
            r1 = r0 + resolution.height
            for offset, dataset in ((0, self._train), (2, self._val)):
                samples = dataset.rays_for_camera(camera)
                act = dataset.render(samples.rays).numpy()
                pred = render(samples, False)
                frame[r0:r1, c[offset]:c[offset + 1]] = dataset.to_image(
                    camera, act.color)
                frame[r0:r1, c[offset + 1]:c[offset + 2]] = dataset.to_image(
                    camera, np.clip(np.asarray(pred.color), 0, 1))

        name = "frame_{:05d}.png".format(self._index)
        _write_png(os.path.join(self._output_dir, name), frame)
        self._index += 1
