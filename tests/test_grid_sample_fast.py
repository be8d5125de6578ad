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


def test_large_voxels_fall_back_to_autodiff(monkeypatch):
    """Voxels past the fast path's ~160^3 transient ceiling must use
    the autodiff grid_sample (same values either way; the fast VJP's
    padded 8C buffer would be ~GBs at 256^3)."""
    import jax

    from fourier_feature_nets_tpu.models import Voxels, voxels

    calls = {"fast": 0, "auto": 0}
    fast = voxels.grid_sample_3d_fast
    auto = voxels.grid_sample_3d

    def counting_fast(grid, coords):
        calls["fast"] += 1
        return fast(grid, coords)

    def counting_auto(grid, coords):
        calls["auto"] += 1
        return auto(grid, coords)

    monkeypatch.setattr(voxels, "grid_sample_3d_fast", counting_fast)
    monkeypatch.setattr(voxels, "grid_sample_3d", counting_auto)

    pts = np.asarray(np.random.default_rng(0).uniform(-1, 1, (16, 3)),
                     np.float32)
    small = Voxels(side=8, scale=1.0)
    small.apply(small.init(jax.random.PRNGKey(0)), pts)
    assert calls == {"fast": 1, "auto": 0}

    big = Voxels(side=161, scale=1.0)
    big.apply(big.init(jax.random.PRNGKey(0)), pts)
    assert calls == {"fast": 1, "auto": 1}
