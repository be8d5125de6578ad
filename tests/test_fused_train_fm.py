"""Feature-major fused training kernel (ops/fused_nerf_train_fm.py):
gradient parity with XLA autodiff, cross-layout parity with the
row-major train kernel, and end-to-end training through the
raycaster's FM default."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.models import NeRF
from fourier_feature_nets_tpu.ops.fused_nerf_train import (
    fused_nerf_train_apply,
    model_statics,
    pack_fused_nerf,
)
from fourier_feature_nets_tpu.ops.fused_nerf_train_fm import (
    fused_nerf_train_apply_fm,
    model_statics_fm,
    pack_fused_nerf_fm,
)


@pytest.fixture(scope="module")
def nerf():
    model = NeRF(num_layers=4, num_channels=32, max_log_scale_pos=4.0,
                 num_freq_pos=5, max_log_scale_view=2.0, num_freq_view=3,
                 skips=[2], include_inputs=True)
    return model, model.init(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    N = 256
    pos = jnp.asarray(rng.uniform(-1, 1, (N, 3)).astype(np.float32))
    views = rng.normal(size=(N, 3)).astype(np.float32)
    views /= np.linalg.norm(views, axis=-1, keepdims=True)
    target = jnp.asarray(rng.uniform(0, 1, (N, 4)).astype(np.float32))
    return pos, jnp.asarray(views), target


def _loss_fm(model, pos, views, target):
    statics = model_statics_fm(model, jnp.float32)

    def loss(p):
        packed = pack_fused_nerf_fm(model, p, jnp.float32)
        out = fused_nerf_train_apply_fm(statics, packed, pos, views,
                                        128, True)
        return jnp.mean(jnp.square(jax.nn.sigmoid(out) - target))

    return loss


def test_gradients_match_autodiff(nerf, batch):
    model, params = nerf
    pos, views, target = batch

    def loss_ref(p):
        out = model.apply(p, pos, views)
        return jnp.mean(jnp.square(jax.nn.sigmoid(out) - target))

    l1, g1 = jax.jit(jax.value_and_grad(
        _loss_fm(model, pos, views, target)))(params)
    l2, g2 = jax.jit(jax.value_and_grad(loss_ref))(params)
    assert abs(float(l1) - float(l2)) < 1e-4
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=2e-4)


def test_gradients_match_row_major_kernel(nerf, batch):
    """Cross-layout check: FM and row-major kernels implement the
    same recompute-backward math; their f32 gradients agree to float
    round-off."""
    model, params = nerf
    pos, views, target = batch
    statics_rm = model_statics(model, jnp.float32)

    def loss_rm(p):
        packed = pack_fused_nerf(model, p, jnp.float32)
        out = fused_nerf_train_apply(statics_rm, packed, pos, views,
                                     128, True)
        return jnp.mean(jnp.square(jax.nn.sigmoid(out) - target))

    l1, g1 = jax.jit(jax.value_and_grad(
        _loss_fm(model, pos, views, target)))(params)
    l2, g2 = jax.jit(jax.value_and_grad(loss_rm))(params)
    assert abs(float(l1) - float(l2)) < 1e-5
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-5)


def test_forward_value_matches_inference_kernel(nerf, batch):
    from fourier_feature_nets_tpu.ops.fused_nerf_fm import (
        fused_nerf_apply_fm,
        prepare_fused_nerf_fm,
    )
    model, params = nerf
    pos, views, _ = batch
    statics = model_statics_fm(model, jnp.float32)
    packed = jax.jit(
        lambda p: pack_fused_nerf_fm(model, p, jnp.float32))(params)
    out_train = fused_nerf_train_apply_fm(statics, packed, pos, views,
                                          128, True)
    weights = prepare_fused_nerf_fm(model, params, dtype=jnp.float32)
    out_inf = fused_nerf_apply_fm(model, weights, pos, views,
                                  tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out_train),
                               np.asarray(out_inf),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("config", [
    dict(num_layers=2, num_channels=32, skips=[], include_inputs=False),
    dict(num_layers=3, num_channels=48, skips=[1, 2],
         include_inputs=True),
])
def test_gradients_match_autodiff_config_sweep(config, batch):
    model = NeRF(max_log_scale_pos=4.0, num_freq_pos=5,
                 max_log_scale_view=2.0, num_freq_view=3, **config)
    params = model.init(jax.random.PRNGKey(7))
    pos, views, target = batch

    def loss_ref(p):
        out = model.apply(p, pos, views)
        return jnp.mean(jnp.square(jax.nn.sigmoid(out) - target))

    l1, g1 = jax.jit(jax.value_and_grad(
        _loss_fm(model, pos, views, target)))(params)
    l2, g2 = jax.jit(jax.value_and_grad(loss_ref))(params)
    assert abs(float(l1) - float(l2)) < 1e-4
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=2e-4)


def test_fused_fit_trains(nerf):
    """A few FM fused train steps through Raycaster.fit reduce the
    loss comparably to the XLA autodiff path (same protocol as the
    row-major test)."""
    from fourier_feature_nets_tpu.datasets.synthetic import (
        generate_synthetic_dataset,
    )
    import os
    import tempfile
    model, params = nerf
    with tempfile.TemporaryDirectory() as tmp:
        path = generate_synthetic_dataset(
            os.path.join(tmp, "scene.npz"), resolution=24,
            split_counts=(3, 1, 1), volume_side=16, num_samples=64)
        train = ffn.ImageDataset.load(path, "train", num_samples=16)
        val = ffn.ImageDataset.load(path, "val", num_samples=16)

        results = {}
        for fused in (False, True):
            caster = ffn.Raycaster(model, fused_train=fused)
            assert caster.fused_layout == "fm"
            p = model.init(jax.random.PRNGKey(1))
            p, log = caster.fit(p, train, val, batch_size=128,
                                learning_rate=1e-3, num_steps=30,
                                crop_steps=0, report_interval=30,
                                decay_rate=0.1, decay_steps=250000)
            results[fused] = log[-1].val_psnr

        assert results[True] == pytest.approx(results[False], abs=0.5)


def test_rejects_doubled_weights(nerf, batch):
    from fourier_feature_nets_tpu.ops.fused_nerf import (
        prepare_fused_nerf,
    )
    from fourier_feature_nets_tpu.ops.fused_nerf_fm import (
        FusedNeRFWeightsFM,
    )
    model, params = nerf
    pos, views, _ = batch
    doubled = prepare_fused_nerf(model, params, dtype=jnp.float32,
                                 use_doubling=True)
    fm_doubled = FusedNeRFWeightsFM(
        *jax.tree_util.tree_map(lambda a: a.T, doubled))
    statics = model_statics_fm(model, jnp.float32)
    with pytest.raises(ValueError):
        fused_nerf_train_apply_fm(statics, fm_doubled, pos, views,
                                  128, True)
