"""Fused custom-VJP training kernel: gradient parity with XLA
autodiff and end-to-end training through the raycaster."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.models import NeRF
from fourier_feature_nets_tpu.ops.fused_nerf_train import (
    _relu_mask,
    fused_nerf_train_apply,
    model_statics,
    pack_fused_nerf,
)


def test_relu_mask_exact_for_all_nonnegative_floats():
    """The compare-free mask must be EXACTLY 0/1 for every normal
    positive float (the old h/(h+1e-30) form returned fractional
    masks below ~3.4e-23, silently shrinking those units' gradients).
    Subnormals flush to zero under XLA and are out of scope."""
    h = jnp.asarray([0.0, 1.2e-38, 1e-30, 3e-23, 1e-10,
                     1.0, 5.5, 3.4e38], jnp.float32)
    expected = np.asarray([0, 1, 1, 1, 1, 1, 1, 1], np.float32)
    np.testing.assert_array_equal(np.asarray(_relu_mask(h)), expected)
    # bf16 inputs (the kernels' compute dtype) are upcast first
    hb = jnp.asarray([0.0, 1.2e-38, 1e-20, 2.0], jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(_relu_mask(hb)),
                                  [0.0, 1.0, 1.0, 1.0])


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


def test_gradients_match_autodiff(nerf, batch):
    model, params = nerf
    pos, views, target = batch
    statics = model_statics(model, dtype=jnp.float32)

    def loss_fused(p):
        packed = pack_fused_nerf(model, p, dtype=jnp.float32)
        out = fused_nerf_train_apply(statics, packed, pos, views, 128,
                                     True)
        return jnp.mean(jnp.square(jax.nn.sigmoid(out) - target))

    def loss_ref(p):
        out = model.apply(p, pos, views)
        return jnp.mean(jnp.square(jax.nn.sigmoid(out) - target))

    l1, g1 = jax.value_and_grad(loss_fused)(params)
    l2, g2 = jax.value_and_grad(loss_ref)(params)
    assert float(l1) == pytest.approx(float(l2), rel=1e-4)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-6)


def test_forward_value_matches_inference_kernel(nerf, batch):
    model, params = nerf
    pos, views, _ = batch
    statics = model_statics(model, dtype=jnp.float32)
    packed = pack_fused_nerf(model, params, dtype=jnp.float32)
    out = fused_nerf_train_apply(statics, packed, pos, views, 128, True)
    ref = model.apply(params, pos, views)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=2e-4)


def test_fused_fit_trains(nerf):
    """A few fused train steps through Raycaster.fit reduce the loss
    comparably to the XLA path."""
    from fourier_feature_nets_tpu.datasets.synthetic import (
        generate_synthetic_dataset,
    )
    import tempfile, os
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
            p = model.init(jax.random.PRNGKey(1))
            p, log = caster.fit(p, train, val, batch_size=128,
                                learning_rate=1e-3, num_steps=30,
                                crop_steps=0, report_interval=30,
                                decay_rate=0.1, decay_steps=250000)
            results[fused] = log[-1].val_psnr

        # both paths train; fused PSNR tracks the XLA path closely
        assert results[True] == pytest.approx(results[False], abs=0.5)


@pytest.mark.parametrize("config", [
    dict(num_layers=2, num_channels=32, skips=[], include_inputs=False),
    dict(num_layers=3, num_channels=48, skips=[1, 2],
         include_inputs=True),
])
def test_gradients_match_autodiff_config_sweep(config, batch):
    """The recompute-backward kernel re-derives the skip/encode
    structure independently of the forward; sweep the structural axes
    (no skips, double skips, raw-input concat off) for gradient
    parity."""
    model = NeRF(max_log_scale_pos=4.0, num_freq_pos=5,
                 max_log_scale_view=2.0, num_freq_view=3, **config)
    params = model.init(jax.random.PRNGKey(6))
    pos, views, target = batch
    statics = model_statics(model, dtype=jnp.float32)

    def loss_fused(p):
        packed = pack_fused_nerf(model, p, dtype=jnp.float32)
        out = fused_nerf_train_apply(statics, packed, pos, views, 128,
                                     True)
        return jnp.mean(jnp.square(jax.nn.sigmoid(out) - target))

    def loss_ref(p):
        out = model.apply(p, pos, views)
        return jnp.mean(jnp.square(jax.nn.sigmoid(out) - target))

    g_fused = jax.grad(loss_fused)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_rejects_doubled_weights(nerf, batch):
    """prepare_fused_nerf(use_doubling=True) weights must be rejected:
    the train kernels' encode always emits (cos, sin[, raw]) parts and
    would silently zip-truncate against the single permuted part."""
    from fourier_feature_nets_tpu.ops.fused_nerf import (
        prepare_fused_nerf,
    )
    # a doubling-eligible config (consecutive powers of two)
    model = NeRF(num_layers=2, num_channels=32, max_log_scale_pos=4.0,
                 num_freq_pos=5, max_log_scale_view=2.0,
                 num_freq_view=3, skips=[1], include_inputs=True)
    params = model.init(jax.random.PRNGKey(0))
    doubled = prepare_fused_nerf(model, params, dtype=jnp.float32,
                                 use_doubling=True)
    pos, views, _ = batch
    statics = model_statics(model, dtype=jnp.float32)
    with pytest.raises(ValueError, match="non-doubled"):
        fused_nerf_train_apply(statics, doubled, pos, views, 128, True)
