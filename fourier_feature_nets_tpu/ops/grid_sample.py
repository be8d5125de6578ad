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

import jax
import jax.numpy as jnp

__all__ = ["grid_sample_3d", "grid_sample_3d_fast"]


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


def _corner_data(grid_shape, coords):
    """Flat corner indices (N, 8) + trilinear weights (N, 8) + the
    per-axis interpolation state needed for coordinate gradients."""
    depth, height, width = grid_shape[:3]
    x = _unnormalize(coords[:, 0], width)
    y = _unnormalize(coords[:, 1], height)
    z = _unnormalize(coords[:, 2], depth)
    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    dx, dy, dz = x - x0, y - y0, z - z0

    x0i = jnp.clip(x0.astype(jnp.int32), 0, width - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, width - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, height - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, height - 1)
    z0i = jnp.clip(z0.astype(jnp.int32), 0, depth - 1)
    z1i = jnp.clip(z0.astype(jnp.int32) + 1, 0, depth - 1)

    def flat(zi, yi, xi):
        return (zi * height + yi) * width + xi

    # order: bit 2 = z, bit 1 = y, bit 0 = x (corner index c)
    indices = jnp.stack([
        flat(z0i, y0i, x0i), flat(z0i, y0i, x1i),
        flat(z0i, y1i, x0i), flat(z0i, y1i, x1i),
        flat(z1i, y0i, x0i), flat(z1i, y0i, x1i),
        flat(z1i, y1i, x0i), flat(z1i, y1i, x1i)], axis=-1)

    wx = jnp.stack([1 - dx, dx], -1)          # (N, 2)
    wy = jnp.stack([1 - dy, dy], -1)
    wz = jnp.stack([1 - dz, dz], -1)
    weights = (wz[:, :, None, None] * wy[:, None, :, None]
               * wx[:, None, None, :]).reshape(-1, 8)
    return indices, weights, (dx, dy, dz)


@jax.custom_vjp
def grid_sample_3d_fast(grid: jnp.ndarray,
                        coords: jnp.ndarray) -> jnp.ndarray:
    """grid_sample_3d with an explicit sorted-segment-sum backward.

    Measured on v5e: the device sort dominates and this is ~1.5x
    SLOWER than XLA's native scatter-add backward for 128^3 grids at
    262k points/step (99 ms vs 146 ms), so :class:`models.Voxels`
    uses the plain autodiff path. Kept as the reference implementation
    for backends/shapes where scatter lowers worse than sort, and as
    the gradient-parity oracle (tests/test_grid_sample_fast.py).
    """
    return grid_sample_3d(grid, coords)


def _gs_fwd(grid, coords):
    return grid_sample_3d(grid, coords), (grid, coords)


def _gs_bwd(residuals, g):
    grid, coords = residuals
    depth, height, width, channels = grid.shape
    indices, weights, (dx, dy, dz) = _corner_data(grid.shape, coords)

    # d_grid: sorted segment-sum scatter of g * w into the 8 corners
    contributions = (g[:, None, :] * weights[..., None])  # (N, 8, C)
    flat_idx = indices.reshape(-1)
    flat_vals = contributions.reshape(-1, channels)
    order = jnp.argsort(flat_idx)
    d_grid_flat = jax.ops.segment_sum(
        flat_vals[order], flat_idx[order],
        num_segments=depth * height * width, indices_are_sorted=True)
    d_grid = d_grid_flat.reshape(grid.shape)

    # d_coords: analytic derivative of the trilinear lerp
    flat_grid = grid.reshape(-1, channels)
    corners = flat_grid[indices]                      # (N, 8, C)
    gc = jnp.sum(g[:, None, :] * corners, axis=-1)    # (N, 8) g . v_c

    wx = jnp.stack([1 - dx, dx], -1)
    wy = jnp.stack([1 - dy, dy], -1)
    wz = jnp.stack([1 - dz, dz], -1)
    sign = jnp.asarray([-1.0, 1.0])

    # corner c = (zbit, ybit, xbit); build per-corner factors
    zbit = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1])
    ybit = jnp.asarray([0, 0, 1, 1, 0, 0, 1, 1])
    xbit = jnp.asarray([0, 1, 0, 1, 0, 1, 0, 1])

    wz_c = wz[:, zbit]
    wy_c = wy[:, ybit]
    wx_c = wx[:, xbit]
    # d weight / d dx = sign(xbit) * wy * wz, etc.; d index / d coord
    # = size / 2 from _unnormalize
    d_dx = jnp.sum(gc * sign[xbit] * wy_c * wz_c, axis=-1) * (width / 2)
    d_dy = jnp.sum(gc * sign[ybit] * wx_c * wz_c, axis=-1) * (height / 2)
    d_dz = jnp.sum(gc * sign[zbit] * wx_c * wy_c, axis=-1) * (depth / 2)
    d_coords = jnp.stack([d_dx, d_dy, d_dz], -1)
    return d_grid, d_coords


grid_sample_3d_fast.defvjp(_gs_fwd, _gs_bwd)
