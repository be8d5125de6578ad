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
    """grid_sample_3d with a cell-binned scatter backward.

    The naive grid gradient scatters 8N weighted corner contributions
    (XLA lowers scatter-add to a serialized per-row update — the
    measured dense-Voxels bottleneck; a sorted segment-sum was 1.5x
    worse again, see docs/RESULTS.md). Here every point's EIGHT corner
    contributions are binned into ONE scatter row keyed by the
    point's containing cell (8x fewer scatter rows, 8C channels per
    row), and corner placement becomes eight DENSE rolled adds on a
    +1-padded grid whose border fold-back reproduces torch's
    border-padding clamp exactly. Scatter work drops from 8N rows to
    N rows; the dense shifts are pure HBM bandwidth.

    Numerically exact vs the autodiff oracle
    (tests/test_grid_sample_fast.py). Memory: one transient
    (D+2)(H+2)(W+2) x 8C buffer (~280 MB at 128^3 x 4ch f32) — use
    the autodiff path for grids past ~160^3.
    """
    return grid_sample_3d(grid, coords)


def _gs_fwd(grid, coords):
    return grid_sample_3d(grid, coords), (grid, coords)


def _corner_offsets():
    """Corner bit patterns (Python ints — the roll shifts must be
    static under jit), index order matching _corner_data."""
    zbit = (0, 0, 0, 0, 1, 1, 1, 1)
    ybit = (0, 0, 1, 1, 0, 0, 1, 1)
    xbit = (0, 1, 0, 1, 0, 1, 0, 1)
    return zbit, ybit, xbit


def _gs_bwd(residuals, g):
    grid, coords = residuals
    depth, height, width, channels = grid.shape
    indices, _, (dx, dy, dz) = _corner_data(grid.shape, coords)

    # ---- d_grid: cell-binned scatter + dense corner shifts ----
    # Clamping coords to [-1, 1] first leaves the grid gradient
    # unchanged (beyond the border both corners of the crossing axis
    # collapse onto the same edge cell, so only the SUM of their
    # weights matters — and it is 1 either way), but gives every
    # point an unclamped base cell in [-1, size-1] per axis, which
    # the +1-padded accumulator indexes directly.
    clamped = jnp.clip(coords, -1.0, 1.0)
    xc = _unnormalize(clamped[:, 0], width)
    yc = _unnormalize(clamped[:, 1], height)
    zc = _unnormalize(clamped[:, 2], depth)
    x0f, y0f, z0f = jnp.floor(xc), jnp.floor(yc), jnp.floor(zc)
    wx = jnp.stack([1 - (xc - x0f), xc - x0f], -1)
    wy = jnp.stack([1 - (yc - y0f), yc - y0f], -1)
    wz = jnp.stack([1 - (zc - z0f), zc - z0f], -1)
    cw = (wz[:, :, None, None] * wy[:, None, :, None]
          * wx[:, None, None, :]).reshape(-1, 8)       # (N, 8)

    pd, ph, pw = depth + 2, height + 2, width + 2
    base = (((z0f.astype(jnp.int32) + 1) * ph
             + (y0f.astype(jnp.int32) + 1)) * pw
            + (x0f.astype(jnp.int32) + 1))             # (N,)
    contributions = (g[:, None, :] * cw[..., None]).reshape(
        -1, 8 * channels)                              # (N, 8C)
    binned = jnp.zeros((pd * ph * pw, 8 * channels),
                       contributions.dtype)
    binned = binned.at[base].add(contributions)
    binned = binned.reshape(pd, ph, pw, 8, channels)

    zbit, ybit, xbit = _corner_offsets()
    acc = jnp.zeros((pd, ph, pw, channels), binned.dtype)
    for corner in range(8):
        # roll is exact here: the padded support is [0, size] per
        # axis, so a +1 roll wraps only the empty top plane
        acc = acc + jnp.roll(
            binned[..., corner, :],
            (zbit[corner], ybit[corner], xbit[corner]),
            axis=(0, 1, 2))

    # fold the pad planes onto the border (torch border clamping)
    acc = acc.at[1].add(acc[0]).at[pd - 2].add(acc[pd - 1])
    acc = acc[1:pd - 1]
    acc = acc.at[:, 1].add(acc[:, 0]).at[:, ph - 2].add(acc[:, ph - 1])
    acc = acc[:, 1:ph - 1]
    acc = (acc.at[:, :, 1].add(acc[:, :, 0])
           .at[:, :, pw - 2].add(acc[:, :, pw - 1]))
    d_grid = acc[:, :, 1:pw - 1]

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
