"""grid_sample_3d_fast: custom-VJP gradient parity with autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from fourier_feature_nets_tpu.ops.grid_sample import (
    grid_sample_3d,
    grid_sample_3d_fast,
)


def test_forward_identical(rng):
    grid = jnp.asarray(rng.normal(size=(7, 7, 7, 4)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.2, 1.2, (128, 3))
                         .astype(np.float32))
    a = grid_sample_3d(grid, coords)
    b = grid_sample_3d_fast(grid, coords)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gradients_match_autodiff(rng):
    grid = jnp.asarray(rng.normal(size=(9, 9, 9, 4)).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-0.9, 0.9, (256, 3))
                         .astype(np.float32))
    target = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32))

    def loss(fn):
        return lambda g, c: jnp.mean(jnp.square(fn(g, c) - target))

    dg1, dc1 = jax.grad(loss(grid_sample_3d), argnums=(0, 1))(grid,
                                                              coords)
    dg2, dc2 = jax.grad(loss(grid_sample_3d_fast),
                        argnums=(0, 1))(grid, coords)
    np.testing.assert_allclose(np.asarray(dg1), np.asarray(dg2),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dc1), np.asarray(dc2),
                               atol=1e-5)


def test_grid_gradients_match_at_and_beyond_borders(rng):
    """Border clamping: the cell-binned backward folds its pad planes
    onto the edge cells; points outside [-1, 1] and points whose
    interpolation cell straddles the border must produce the same grid
    gradient as autodiff (torch border-padding semantics)."""
    grid = jnp.asarray(rng.normal(size=(6, 5, 7, 4)).astype(np.float32))
    # heavy tails: many points beyond the volume plus exact corners
    coords = np.concatenate([
        rng.uniform(-1.8, 1.8, (256, 3)),
        np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0],
                  [-1.0, 1.0, -1.0], [2.5, -2.5, 0.0]]),
    ]).astype(np.float32)
    coords = jnp.asarray(coords)
    target = jnp.asarray(rng.normal(size=(260, 4)).astype(np.float32))

    def loss(fn):
        return lambda g: jnp.mean(jnp.square(fn(g, coords) - target))

    dg1 = jax.grad(loss(lambda g, c: grid_sample_3d(g, c)))(grid)
    dg2 = jax.grad(loss(lambda g, c: grid_sample_3d_fast(g, c)))(grid)
    np.testing.assert_allclose(np.asarray(dg1), np.asarray(dg2),
                               atol=1e-6)
