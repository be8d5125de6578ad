"""Synthetic multi-view dataset generation.

The reference ships its 3D datasets as downloadable NPZ archives
(/root/reference/fourier_feature_nets/image_dataset.py:388-471 schema:
images (C,R,R,4) u8, intrinsics (C,3,3), extrinsics (C,4,4), bounds
(4,4), split_counts (3)). For air-gapped environments — and for fast,
deterministic end-to-end tests — this module *generates* scenes in the
exact same schema: a procedural RGBA voxel volume is ray-marched with
the framework's own volume-rendering ops on device.

Because the generated images come from the same emission-absorption
model the framework trains against, a voxel model of sufficient
resolution can fit them to high PSNR — making PSNR-vs-steps a sharp
regression signal.
"""

import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import Resolution, raycast_grid
from ..ops import (
    batch_linspace,
    bounds_min_max,
    calculate_blend_weights,
    grid_sample_3d,
    ray_aabb_near_far,
    sample_positions,
)
from ..utils.camera_paths import hemisphere

__all__ = ["make_scene_volume", "render_dataset_images",
           "generate_synthetic_dataset", "load_or_generate",
           "generate_synthetic_image"]


def make_scene_volume(side: int = 64) -> np.ndarray:
    """Builds a procedural RGBA volume on [-1, 1]^3.

    The scene is a composition with structure at several spatial
    frequencies: a large center cube with a spherical cavity, a small
    dense sphere, and a thin ground slab — each colored by smooth
    spatial gradients so appearance is view-consistent.

    Returns:
        (side, side, side, 4) float32 array; rgb in [0, 1], density
        (last channel) in absorption units.
    """
    coords = np.linspace(-1, 1, side, dtype=np.float32)
    z, y, x = np.meshgrid(coords, coords, coords, indexing="ij")

    density = np.zeros((side, side, side), np.float32)
    color = np.zeros((side, side, side, 3), np.float32)

    # large cube [-0.45, 0.45]^3 with a spherical cavity of r=0.3
    cube = (np.maximum.reduce([np.abs(x), np.abs(y), np.abs(z)]) < 0.45)
    cavity = (x ** 2 + y ** 2 + z ** 2) < 0.3 ** 2
    body = cube & ~cavity
    density[body] = 40.0
    color[body] = np.stack([0.5 + 0.5 * x, 0.5 + 0.5 * y,
                            0.5 + 0.5 * z], -1)[body]

    # dense sphere at (0.55, 0.3, -0.4), r=0.18
    sphere = ((x - 0.55) ** 2 + (y - 0.3) ** 2
              + (z + 0.4) ** 2) < 0.18 ** 2
    density[sphere] = 80.0
    color[sphere] = np.array([0.9, 0.2, 0.15], np.float32)

    # thin ground slab
    slab = (y > -0.75) & (y < -0.65) & (np.abs(x) < 0.8) & (np.abs(z) < 0.8)
    density[slab] = 60.0
    checker = ((np.floor(x * 4) + np.floor(z * 4)) % 2)
    color[slab] = np.stack([0.2 + 0.6 * checker, 0.7 - 0.4 * checker,
                            0.3 + 0.0 * checker], -1)[slab]

    return np.concatenate([color, density[..., None]], -1)


def render_dataset_images(volume: np.ndarray, cameras, bounds: np.ndarray,
                          num_samples: int = 256,
                          batch_rays: int = 65536) -> np.ndarray:
    """Ray-marches the RGBA volume to per-camera RGBA uint8 images."""
    resolution = cameras[0].resolution
    rays_per_camera = resolution.width * resolution.height
    ray = raycast_grid(cameras)
    lo, hi = bounds_min_max(bounds)
    scale = float(hi[0])

    grid = jnp.asarray(volume)

    @jax.jit
    def render_batch(starts, directions):
        nf = ray_aabb_near_far(starts, directions, jnp.asarray(lo),
                               jnp.asarray(hi))
        near = jnp.where(nf.valid, nf.near, 1.0)
        far = jnp.where(nf.valid, nf.far, 2.0)
        t_values = batch_linspace(near, far, num_samples)
        positions = sample_positions(starts, directions, t_values)
        rgba = grid_sample_3d(grid, positions.reshape(-1, 3) / scale)
        rgba = rgba.reshape(-1, num_samples, 4)
        weights = calculate_blend_weights(t_values, rgba[..., 3])
        # zero weight past the exit plane (the 1e10 tail delta would
        # otherwise absorb everything on the last sample)
        weights = jnp.where(nf.valid[:, None], weights, 0.0)
        color = jnp.sum(weights[..., None] * rgba[..., :3], axis=-2)
        alpha = jnp.sum(weights[..., :-1], axis=-1)
        return color, alpha

    images = []
    num_rays = ray.origin.shape[0]
    colors = np.zeros((num_rays, 3), np.float32)
    alphas = np.zeros((num_rays,), np.float32)
    for start in range(0, num_rays, batch_rays):
        end = min(start + batch_rays, num_rays)
        pad = batch_rays - (end - start)
        starts = np.pad(ray.origin[start:end].astype(np.float32),
                        ((0, pad), (0, 0)))
        dirs = np.pad(ray.direction[start:end].astype(np.float32),
                      ((0, pad), (0, 0)), constant_values=1.0)
        color, alpha = render_batch(jnp.asarray(starts), jnp.asarray(dirs))
        colors[start:end] = np.asarray(color)[:end - start]
        alphas[start:end] = np.asarray(alpha)[:end - start]

    for cam in range(len(cameras)):
        sel = slice(cam * rays_per_camera, (cam + 1) * rays_per_camera)
        rgba = np.concatenate([colors[sel], alphas[sel, None]], -1)
        rgba = rgba.reshape(resolution.height, resolution.width, 4)
        images.append((np.clip(rgba, 0, 1) * 255).astype(np.uint8))
    return np.stack(images)


def generate_synthetic_dataset(path: str, resolution: int = 100,
                               split_counts: Tuple[int, int, int] = (20, 4, 4),
                               volume_side: int = 64,
                               num_samples: int = 256,
                               seed: int = 20080524) -> str:
    """Generates a complete synthetic dataset NPZ at ``path``.

    The NPZ follows the reference schema exactly so
    :meth:`ImageDataset.load` consumes it unchanged.
    """
    rng = np.random.default_rng(seed)
    num_cameras = sum(split_counts)
    res = Resolution(resolution, resolution)
    cameras = hemisphere(np.array([0.0, 1.0, 0.0]),
                         np.array([0.0, 0.0, 1.0]), num_cameras,
                         fov_y_degrees=40.0, resolution=res,
                         distance=3.2, pos_noise=0.05, rng=rng)

    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    volume = make_scene_volume(volume_side)
    images = render_dataset_images(volume, cameras, bounds, num_samples)

    intrinsics = np.stack([c.intrinsics for c in cameras])
    extrinsics = np.stack([c.extrinsics for c in cameras])

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, images=images, intrinsics=intrinsics,
             extrinsics=extrinsics, bounds=bounds,
             split_counts=np.asarray(split_counts))
    return path


def load_or_generate(path: str, **kwargs) -> str:
    """Returns ``path``, generating the synthetic dataset on first use."""
    if not os.path.exists(path):
        generate_synthetic_dataset(path, **kwargs)
    return path


def generate_synthetic_image(path: str, size: int = 512,
                             seed: int = 20080524) -> str:
    """Writes a procedural test image for 2-D image regression.

    Air-gapped stand-in for the reference's packaged photos
    (/root/reference/data/cat.jpg etc., README.md:119-128): a
    composition with energy at several spatial frequencies — smooth
    color gradients, mid-frequency radial rings, a high-frequency
    diagonal checker patch and soft blobs — so the four FFN variants
    separate the same way they do on natural images (MLP blurs,
    positional/gaussian recover detail).
    """
    import cv2

    coords = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    y, x = np.meshgrid(coords, coords, indexing="ij")
    r = np.sqrt(x * x + y * y)

    rng = np.random.default_rng(seed)
    red = 0.5 + 0.5 * np.sin(3.0 * x + 9.0 * r)
    green = 0.5 + 0.5 * np.cos(14.0 * r + 2.0 * y)
    blue = 0.4 + 0.6 * (0.5 + 0.5 * np.sin(40.0 * (x + y)
                                           ) * (r < 0.6))
    for _ in range(6):
        cx, cy = rng.uniform(-0.8, 0.8, 2)
        radius = rng.uniform(0.05, 0.25)
        blob = np.exp(-((x - cx) ** 2 + (y - cy) ** 2)
                      / (2 * radius ** 2))
        channel = rng.integers(0, 3)
        [red, green, blue][channel][:] = np.clip(
            [red, green, blue][channel] + 0.6 * blob, 0.0, 1.0)

    rgb = np.stack([red, green, blue], -1)
    bgr = (np.clip(rgb, 0.0, 1.0)[..., ::-1] * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    cv2.imwrite(path, bgr)
    return path
