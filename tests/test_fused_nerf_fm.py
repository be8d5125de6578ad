"""Feature-major fused NeRF kernel (ops/fused_nerf_fm.py) vs the XLA
reference forward and the row-major kernel (interpret mode on CPU).

The FM kernel is the serving default (Raycaster fused_layout="fm");
its math is the exact transpose of the row-major kernel, so parity
tolerances match tests/test_fused_nerf.py.
"""

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
from fourier_feature_nets_tpu.ops.fused_nerf_fm import (
    FusedNeRFWeightsFM,
    fused_nerf_apply_fm,
    prepare_fused_nerf_fm,
)


@pytest.fixture(scope="module")
def nerf():
    model = NeRF(num_layers=4, num_channels=64, max_log_scale_pos=9.0,
                 num_freq_pos=10, max_log_scale_view=3.0, num_freq_view=4,
                 skips=[2], include_inputs=True)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(-1.5, 1.5, (200, 3)).astype(np.float32))
    views = rng.normal(size=(200, 3)).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    return pos, jnp.asarray(views)


class TestFeatureMajorKernel:
    def test_f32_matches_reference(self, nerf, inputs):
        model, params = nerf
        pos, views = inputs
        ref = np.asarray(model.apply(params, pos, views))
        weights = prepare_fused_nerf_fm(model, params, dtype=jnp.float32)
        out = np.asarray(fused_nerf_apply_fm(model, weights, pos, views,
                                             tile=128, interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)

    def test_bf16_close_to_reference(self, nerf, inputs):
        model, params = nerf
        pos, views = inputs
        ref = np.asarray(model.apply(params, pos, views))
        weights = prepare_fused_nerf_fm(model, params,
                                        dtype=jnp.bfloat16)
        out = np.asarray(fused_nerf_apply_fm(model, weights, pos, views,
                                             tile=128, interpret=True))
        np.testing.assert_allclose(out, ref, atol=0.05)

    def test_dispatch_through_fused_nerf_apply(self, nerf, inputs):
        """fused_nerf_apply must route FM weights to the FM kernel —
        this is what lets every Raycaster/distill call site stay
        layout-agnostic."""
        model, params = nerf
        pos, views = inputs
        weights = prepare_fused_nerf_fm(model, params, dtype=jnp.float32)
        via_dispatch = np.asarray(fused_nerf_apply(
            model, weights, pos, views, tile=128, interpret=True))
        direct = np.asarray(fused_nerf_apply_fm(
            model, weights, pos, views, tile=128, interpret=True))
        np.testing.assert_array_equal(via_dispatch, direct)

    def test_split_rejected_for_fm_weights(self, nerf, inputs):
        """The sub-chain ILP `split` knob is row-major-only; FM
        dispatch must refuse it rather than silently measure
        split=1 in an A/B."""
        model, params = nerf
        pos, views = inputs
        weights = prepare_fused_nerf_fm(model, params, dtype=jnp.float32)
        with pytest.raises(ValueError, match="row-major"):
            fused_nerf_apply(model, weights, pos, views, tile=128,
                             interpret=True, split=2)

    def test_weights_are_exact_transpose(self, nerf):
        """The FM weight pytree is leaf-for-leaf the transpose of the
        row-major packing (shared flatten order — a new field only
        has to be threaded through one place)."""
        model, params = nerf
        rm = prepare_fused_nerf(model, params, dtype=jnp.float32)
        fm = prepare_fused_nerf_fm(model, params, dtype=jnp.float32)
        assert isinstance(fm, FusedNeRFWeightsFM)
        rm_leaves = jax.tree_util.tree_leaves(rm)
        fm_leaves = jax.tree_util.tree_leaves(fm)
        assert len(rm_leaves) == len(fm_leaves)
        for a, b in zip(rm_leaves, fm_leaves):
            np.testing.assert_array_equal(np.asarray(a).T, np.asarray(b))

    def test_padding_of_ragged_batch(self, nerf, inputs):
        model, params = nerf
        pos, views = inputs
        weights = prepare_fused_nerf_fm(model, params, dtype=jnp.float32)
        out = fused_nerf_apply_fm(model, weights, pos[:77], views[:77],
                                  tile=128, interpret=True)
        assert out.shape == (77, 4)
        full = fused_nerf_apply_fm(model, weights, pos, views,
                                   tile=128, interpret=True)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(full[:77]),
                                   rtol=1e-6, atol=1e-6)


# sweep the structural axes (skip layout, raw-input concat, channel
# width) — same configurations as the row-major kernel sweep
@pytest.mark.parametrize("config", [
    dict(num_layers=2, num_channels=32, skips=[], include_inputs=False),
    dict(num_layers=3, num_channels=48, skips=[1, 2],
         include_inputs=True),
    dict(num_layers=4, num_channels=64, skips=[2],
         include_inputs=False),
])
def test_fm_config_sweep_matches_reference(config):
    model = NeRF(max_log_scale_pos=6.0, num_freq_pos=7,
                 max_log_scale_view=2.0, num_freq_view=3, **config)
    params = model.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(-1.5, 1.5, (96, 3)).astype(np.float32))
    views = rng.normal(size=(96, 3)).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    views = jnp.asarray(views)
    ref = np.asarray(model.apply(params, pos, views))
    weights = prepare_fused_nerf_fm(model, params, dtype=jnp.float32)
    out = np.asarray(fused_nerf_apply_fm(model, weights, pos, views,
                                         tile=32, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)


class TestRaycasterLayouts:
    def _samples(self):
        from fourier_feature_nets_tpu.render.ray_sampler import RaySamples
        rng = np.random.default_rng(0)
        R, S = 24, 8
        t = np.sort(rng.uniform(1, 3, (R, S)).astype(np.float32), -1)
        d = rng.normal(size=(R, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        s = rng.uniform(-0.5, 0.5, (R, 3)).astype(np.float32)
        pos = (s[:, None] + t[..., None] * d[:, None]).astype(np.float32)
        return RaySamples(jnp.asarray(pos),
                          jnp.asarray(np.ascontiguousarray(
                              np.broadcast_to(d[:, None], pos.shape))),
                          jnp.asarray(t), None)

    def test_fm_default_matches_rm_render(self, nerf):
        model, params = nerf
        samples = self._samples()
        fm = ffn.Raycaster(model, fused=True).batched_render(
            params, samples, 16, include_depth=True)
        rm = ffn.Raycaster(model, fused=True,
                           fused_layout="rm").batched_render(
            params, samples, 16, include_depth=True)
        np.testing.assert_allclose(np.asarray(fm.color),
                                   np.asarray(rm.color), atol=2e-5)
        np.testing.assert_allclose(np.asarray(fm.alpha),
                                   np.asarray(rm.alpha), atol=2e-5)

    def test_fm_weight_cache_produces_fm_type(self, nerf):
        model, params = nerf
        rc = ffn.Raycaster(model, fused=True, fused_train=False)
        assert rc.fused_layout == "fm"
        w = rc._get_fused_weights(params)
        assert isinstance(w, FusedNeRFWeightsFM)
        assert rc._get_fused_weights(params) is w

    def test_invalid_layout_rejected(self, nerf):
        model, _ = nerf
        with pytest.raises(ValueError):
            ffn.Raycaster(model, fused_layout="columnwise")


class TestMalformedPackGuard:
    def test_wrong_parts_count_raises(self, nerf, inputs):
        """A hand-built FM pack with a doubled-style parts split must
        fail loudly — silently dropping the sin/raw encode terms is
        the failure mode (ADVICE r4; the train path already guards
        via _validate_packed_fm)."""
        model, params = nerf
        pos, views = inputs
        weights = prepare_fused_nerf_fm(model, params)
        bad = weights._replace(first_parts=weights.first_parts[:1])
        with pytest.raises(ValueError, match="non-doubled"):
            fused_nerf_apply_fm(model, bad, pos, views,
                                interpret=True)
        bad = weights._replace(hidden_parts=weights.hidden_parts[:2])
        with pytest.raises(ValueError, match="non-doubled"):
            fused_nerf_apply_fm(model, bad, pos, views,
                                interpret=True)
