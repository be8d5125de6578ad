"""Fused Pallas NeRF kernel vs the XLA reference forward (interpret
mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.models import NeRF
from fourier_feature_nets_tpu.ops.fused_nerf import (
    fused_nerf_apply,
    prepare_fused_nerf,
)


@pytest.fixture(scope="module")
def nerf():
    model = NeRF(num_layers=4, num_channels=64, max_log_scale_pos=9.0,
                 num_freq_pos=10, max_log_scale_view=3.0, num_freq_view=4,
                 skips=[2], include_inputs=True)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


@pytest.fixture(scope="module")
def inputs(nerf):
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(-1.5, 1.5, (200, 3)).astype(np.float32))
    views = rng.normal(size=(200, 3)).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    return pos, jnp.asarray(views)


class TestFusedKernel:
    def test_f32_matches_reference(self, nerf, inputs):
        model, params = nerf
        pos, views = inputs
        ref = np.asarray(model.apply(params, pos, views))
        weights = prepare_fused_nerf(model, params, dtype=jnp.float32)
        out = np.asarray(fused_nerf_apply(model, weights, pos, views,
                                          tile=128, interpret=True))
        # fast-trig polynomial: rendering-grade tolerance
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)

    def test_doubling_matches_reference(self, nerf, inputs):
        model, params = nerf
        pos, views = inputs
        ref = np.asarray(model.apply(params, pos, views))
        weights = prepare_fused_nerf(model, params, dtype=jnp.float32,
                                     use_doubling=True)
        assert len(weights.first_parts) == 1  # doubling active
        out = np.asarray(fused_nerf_apply(model, weights, pos, views,
                                          tile=128, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)

    def test_bf16_close_to_reference(self, nerf, inputs):
        model, params = nerf
        pos, views = inputs
        ref = np.asarray(model.apply(params, pos, views))
        weights = prepare_fused_nerf(model, params, dtype=jnp.bfloat16)
        out = np.asarray(fused_nerf_apply(model, weights, pos, views,
                                          tile=128, interpret=True))
        np.testing.assert_allclose(out, ref, atol=0.05)

    @pytest.mark.parametrize("split", [2, 4])
    def test_split_subchains_bit_identical(self, nerf, inputs, split):
        """split=S emits S independent sub-chains stage-major (MXU ILP
        experiment); the math per point is unchanged, so outputs must
        be BIT-identical to the single-chain kernel."""
        model, params = nerf
        pos, views = inputs
        weights = prepare_fused_nerf(model, params, dtype=jnp.bfloat16)
        base = np.asarray(fused_nerf_apply(model, weights, pos, views,
                                           tile=128, interpret=True))
        out = np.asarray(fused_nerf_apply(model, weights, pos, views,
                                          tile=128, split=split,
                                          interpret=True))
        np.testing.assert_array_equal(out, base)

    def test_padding_of_ragged_batch(self, nerf, inputs):
        model, params = nerf
        pos, views = inputs
        weights = prepare_fused_nerf(model, params, dtype=jnp.float32)
        out = fused_nerf_apply(model, weights, pos[:77], views[:77],
                               tile=128, interpret=True)
        assert out.shape == (77, 4)

    def test_non_doubling_config_direct_path(self, inputs):
        pos, views = inputs
        model = NeRF(num_layers=2, num_channels=32,
                     max_log_scale_pos=5.5, num_freq_pos=8,
                     max_log_scale_view=1.5, num_freq_view=2,
                     skips=[1], include_inputs=False)
        params = model.init(jax.random.PRNGKey(1))
        weights = prepare_fused_nerf(model, params, dtype=jnp.float32,
                                     use_doubling=True)
        assert len(weights.first_parts) == 2  # doubling NOT applicable
        ref = np.asarray(model.apply(params, pos, views))
        out = np.asarray(fused_nerf_apply(model, weights, pos, views,
                                          tile=128, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)


class TestFusedRaycaster:
    def test_batched_render_fused_matches_plain(self, nerf):
        model, params = nerf
        from fourier_feature_nets_tpu.render.ray_sampler import RaySamples
        rng = np.random.default_rng(0)
        R, S = 24, 8
        t = np.sort(rng.uniform(1, 3, (R, S)).astype(np.float32), -1)
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        s = rng.uniform(-0.5, 0.5, (R, 3)).astype(np.float32)
        pos = (s[:, None] + t[..., None] * d[:, None]).astype(np.float32)
        samples = RaySamples(jnp.asarray(pos),
                             jnp.asarray(np.ascontiguousarray(
                                 np.broadcast_to(d[:, None], pos.shape))),
                             jnp.asarray(t), None)

        plain = ffn.Raycaster(model).batched_render(params, samples, 16,
                                                    include_depth=True)
        fused = ffn.Raycaster(model, fused=True).batched_render(
            params, samples, 16, include_depth=True)
        np.testing.assert_allclose(fused.color, plain.color, atol=1e-3)
        np.testing.assert_allclose(fused.alpha, plain.alpha, atol=1e-3)

    def test_weight_cache_keyed_by_object_identity(self, nerf):
        """Regression (VERDICT r2): the fused-weight cache was keyed on
        id(params); CPython reuses freed addresses for same-shape
        pytrees, so render(A) -> drop A -> render(B) could silently
        return A's weights. The cache must key on object identity AND
        hold the params alive so a freed-address collision cannot
        alias it."""
        model, params = nerf
        rc = ffn.Raycaster(model, fused=True, fused_train=False)
        p1 = jax.tree.map(jnp.asarray, params)
        w1 = rc._get_fused_weights(p1)
        assert rc._get_fused_weights(p1) is w1  # same object: cache hit
        # the cache must hold a strong reference — this is what makes
        # an id() collision with a *freed* params impossible
        assert rc._fused_params_src is p1

        stale_id = id(p1)
        del p1
        p2 = None
        for _ in range(100):
            # under the old id()-keyed cache the freed address is
            # typically reclaimed within a few allocations, poisoning
            # the lookup; with the strong-ref cache p1 stays alive and
            # no collision can occur
            candidate = jax.tree.map(lambda x: x * 2.0, params)
            p2 = candidate
            if id(candidate) == stale_id:
                break
        w2 = rc._get_fused_weights(p2)
        assert w2 is not w1
        l1 = jax.tree.leaves(w1._asdict())
        l2 = jax.tree.leaves(w2._asdict())
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(l1, l2))


# the S=42 ray-render bug showed shape-dependent kernel defects can
# hide behind a single tested configuration — sweep the structural
# axes (skip layout, raw-input concat, channel width)
@pytest.mark.parametrize("config", [
    dict(num_layers=2, num_channels=32, skips=[], include_inputs=False),
    dict(num_layers=3, num_channels=48, skips=[1, 2],
         include_inputs=True),
    dict(num_layers=4, num_channels=64, skips=[2],
         include_inputs=False),
])
def test_config_sweep_matches_reference(config):
    model = NeRF(max_log_scale_pos=6.0, num_freq_pos=7,
                 max_log_scale_view=2.0, num_freq_view=3, **config)
    params = model.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(-1.5, 1.5, (96, 3)).astype(np.float32))
    views = rng.normal(size=(96, 3)).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    views = jnp.asarray(views)
    ref = np.asarray(model.apply(params, pos, views))
    weights = prepare_fused_nerf(model, params, dtype=jnp.float32)
    out = np.asarray(fused_nerf_apply(model, weights, pos, views,
                                      tile=32, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)
