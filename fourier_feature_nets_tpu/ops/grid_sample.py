"""Trilinear voxel-grid sampling.

A TPU-native equivalent of the single ``F.grid_sample(padding_mode=
"border", align_corners=False)`` call the reference delegates to
PyTorch's CUDA kernel (/root/reference/fourier_feature_nets/
voxels_model.py:39-40). Implemented as gather + lerp in jnp: eight
gathers from the flattened grid and a fused weighted sum — XLA keeps
the lerp arithmetic in registers and the gathers become efficient
dynamic-slices over HBM.

Coordinate convention (torch parity): the last axis of ``coords`` is
(x, y, z) where x indexes the innermost (W) grid axis, y indexes H,
and z indexes D. With ``align_corners=False`` a normalized coordinate
c in [-1, 1] maps to the continuous voxel index
``((c + 1) * size - 1) / 2``; border padding clamps indices to the
valid range.
"""

import jax.numpy as jnp

__all__ = ["grid_sample_3d"]


def _unnormalize(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """[-1, 1] -> continuous voxel index, align_corners=False."""
    return ((coords + 1.0) * size - 1.0) / 2.0


def grid_sample_3d(grid: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Samples a voxel grid at normalized coordinates.

    Args:
        grid: (D, H, W, C) voxel values.
        coords: (N, 3) normalized (x, y, z) coordinates in [-1, 1]
            (values outside are clamped — border padding).

    Returns:
        (N, C) trilinearly interpolated values.
    """
    depth, height, width, channels = grid.shape

    x = _unnormalize(coords[:, 0], width)
    y = _unnormalize(coords[:, 1], height)
    z = _unnormalize(coords[:, 2], depth)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    dx = (x - x0)[:, None]
    dy = (y - y0)[:, None]
    dz = (z - z0)[:, None]

    x0i = jnp.clip(x0.astype(jnp.int32), 0, width - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, width - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, height - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, height - 1)
    z0i = jnp.clip(z0.astype(jnp.int32), 0, depth - 1)
    z1i = jnp.clip(z0.astype(jnp.int32) + 1, 0, depth - 1)

    flat = grid.reshape(-1, channels)

    def gather(zi, yi, xi):
        return flat[(zi * height + yi) * width + xi]

    v000 = gather(z0i, y0i, x0i)
    v001 = gather(z0i, y0i, x1i)
    v010 = gather(z0i, y1i, x0i)
    v011 = gather(z0i, y1i, x1i)
    v100 = gather(z1i, y0i, x0i)
    v101 = gather(z1i, y0i, x1i)
    v110 = gather(z1i, y1i, x0i)
    v111 = gather(z1i, y1i, x1i)

    c00 = v000 * (1 - dx) + v001 * dx
    c01 = v010 * (1 - dx) + v011 * dx
    c10 = v100 * (1 - dx) + v101 * dx
    c11 = v110 * (1 - dx) + v111 * dx

    c0 = c00 * (1 - dy) + c01 * dy
    c1 = c10 * (1 - dy) + c11 * dy

    return c0 * (1 - dz) + c1 * dz
