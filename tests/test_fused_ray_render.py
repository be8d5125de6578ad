"""Fully-fused ray render kernel vs Raycaster.render (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.models import NeRF
from fourier_feature_nets_tpu.ops.fused_nerf import prepare_fused_nerf
from fourier_feature_nets_tpu.ops.fused_ray_render import (
    _exclusive_cumprod_lanes,
    fused_ray_render,
)
from fourier_feature_nets_tpu.render.ray_sampler import RaySamples


def test_exclusive_cumprod_lane_scan(rng):
    from jax.experimental import pallas as pl

    x = rng.uniform(0.5, 1.0, (16, 128)).astype(np.float32)

    def kernel(x_ref, o_ref):
        o_ref[:] = _exclusive_cumprod_lanes(x_ref[:])

    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        interpret=True)(jnp.asarray(x))
    expected = np.concatenate(
        [np.ones((16, 1)), np.cumprod(x, -1)[:, :-1]], -1)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


# S=42 regresses the last-lane gate: 41 * fl32(1/41) rounds below 1.0,
# so the old floor(lane / (S-1))-by-reciprocal gate missed the final
# sample for ~13% of sample counts (negative deltas from the circular
# roll corrupted every ray's composite).
@pytest.mark.parametrize("num_samples", [42, 128])
def test_matches_raycaster_render(rng, num_samples):
    model = NeRF(num_layers=4, num_channels=64, max_log_scale_pos=9.0,
                 num_freq_pos=10, max_log_scale_view=3.0,
                 num_freq_view=4, skips=[2], include_inputs=True)
    params = model.init(jax.random.PRNGKey(0))
    R, S = 40, num_samples
    t = np.sort(rng.uniform(1, 4, (R, S)).astype(np.float32), -1)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    start = rng.uniform(-0.5, 0.5, (R, 3)).astype(np.float32)
    pos = (start[:, None] + t[..., None] * d[:, None]).astype(np.float32)
    views3 = np.ascontiguousarray(np.broadcast_to(d[:, None], pos.shape))

    samples = RaySamples(jnp.asarray(pos), jnp.asarray(views3),
                         jnp.asarray(t), None)
    ref = ffn.Raycaster(model).render(params, samples)

    weights = prepare_fused_nerf(model, params, dtype=jnp.float32)
    out = fused_ray_render(model, weights, jnp.asarray(pos),
                           jnp.asarray(d), jnp.asarray(t),
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, :3]),
                               np.asarray(ref.color), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out[:, 3]),
                               np.asarray(ref.alpha), atol=2e-3)


def test_rejects_doubled_weights(rng):
    model = NeRF(num_layers=4, num_channels=64, max_log_scale_pos=9.0,
                 num_freq_pos=10, max_log_scale_view=3.0,
                 num_freq_view=4, skips=[2], include_inputs=True)
    params = model.init(jax.random.PRNGKey(0))
    weights = prepare_fused_nerf(model, params, dtype=jnp.float32,
                                 use_doubling=True)
    R, S = 16, 8
    t = np.sort(rng.uniform(1, 4, (R, S)).astype(np.float32), -1)
    d = rng.normal(size=(R, 3)).astype(np.float32)
    pos = rng.uniform(-1, 1, (R, S, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="non-doubled"):
        fused_ray_render(model, weights, jnp.asarray(pos),
                         jnp.asarray(d), jnp.asarray(t), interpret=True)
