"""Optimizer parity vs torch.optim.Adam with dual gradient clipping."""

import jax.numpy as jnp
import numpy as np
import pytest

from fourier_feature_nets_tpu.utils import (
    adam_init,
    adam_update,
    exponential_lr,
)


def test_exponential_lr():
    assert float(exponential_lr(1.0, 0, 0.1, 100)) == pytest.approx(1.0)
    assert float(exponential_lr(1.0, 100, 0.1, 100)) == pytest.approx(0.1)
    assert float(exponential_lr(5e-4, 50, 0.1, 100)) == pytest.approx(
        5e-4 * 0.1 ** 0.5, rel=1e-5)


def test_adam_torch_parity(rng):
    """Quadratic fit: ours vs torch Adam + clip_value + clip_norm."""
    torch = pytest.importorskip("torch")

    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    b0 = rng.normal(size=(3,)).astype(np.float32)
    x = rng.normal(size=(32, 4)).astype(np.float32)
    y = rng.normal(size=(32, 3)).astype(np.float32)
    lr, wd, clip = 0.01, 1e-3, 0.05

    # torch run
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    tb = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    optim = torch.optim.Adam([tw, tb], lr, weight_decay=wd)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    for _ in range(10):
        optim.zero_grad()
        loss = ((tx @ tw + tb - ty) ** 2).mean()
        loss.backward()
        torch.nn.utils.clip_grad_value_([tw, tb], clip)
        torch.nn.utils.clip_grad_norm_([tw, tb], clip)
        optim.step()

    # ours
    import jax
    params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
    state = adam_init(params)

    def loss_fn(p):
        pred = jnp.dot(x, p["w"], precision=jax.lax.Precision.HIGHEST)
        return jnp.mean(jnp.square(pred + p["b"] - y))

    grad_fn = jax.grad(loss_fn)
    for _ in range(10):
        grads = grad_fn(params)
        params, state = adam_update(grads, state, params, lr,
                                    weight_decay=wd, clip_value=clip,
                                    clip_norm=clip)

    np.testing.assert_allclose(np.asarray(params["w"]),
                               tw.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(params["b"]),
                               tb.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_adam_converges_on_quadratic():
    import jax
    params = {"x": jnp.array([5.0])}
    state = adam_init(params)
    grad_fn = jax.grad(lambda p: jnp.sum(jnp.square(p["x"] - 2.0)))
    for _ in range(500):
        params, state = adam_update(grad_fn(params), state, params, 0.1)
    assert float(params["x"][0]) == pytest.approx(2.0, abs=1e-2)
