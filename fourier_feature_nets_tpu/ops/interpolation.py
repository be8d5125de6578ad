"""Bilinear image interpolation.

Vectorized equivalent of the reference's NumPy helper
(/root/reference/fourier_feature_nets/utils.py:197-241), written for
jnp so it can run inside jitted visualization/render paths but equally
happy on NumPy inputs.
"""

import jax.numpy as jnp

__all__ = ["interpolate_bilinear"]


def interpolate_bilinear(grid: jnp.ndarray,
                         query_points: jnp.ndarray) -> jnp.ndarray:
    """Samples a (H, W, C) grid at (N, 2) query points in [0, 1].

    Query convention (utils.py:217-218): column = u * width,
    row = v * height, with corner clamping.

    Returns:
        (N, C) interpolated values.
    """
    grid = jnp.asarray(grid)
    query_points = jnp.asarray(query_points)
    assert grid.ndim == 3, "Grid has to be of shape (height, width, dim)"
    assert query_points.ndim == 2, "Query points have to be of shape (N, 2)"

    height, width, _ = grid.shape
    col = query_points[:, 0] * width
    row = query_points[:, 1] * height

    i0 = jnp.floor(row).astype(jnp.int32)
    j0 = jnp.floor(col).astype(jnp.int32)
    di = (row - i0)[:, None]
    dj = (col - j0)[:, None]

    i1 = jnp.clip(i0 + 1, 0, height - 1)
    j1 = jnp.clip(j0 + 1, 0, width - 1)
    i0 = jnp.clip(i0, 0, height - 1)
    j0 = jnp.clip(j0, 0, width - 1)

    v00 = (1 - di) * (1 - dj) * grid[i0, j0, :]
    v01 = (1 - di) * dj * grid[i0, j1, :]
    v10 = di * (1 - dj) * grid[i1, j0, :]
    v11 = di * dj * grid[i1, j1, :]
    return v00 + v01 + v10 + v11
