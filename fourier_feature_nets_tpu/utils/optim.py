"""Optimizer with reference-exact torch semantics.

The reference training loop (/root/reference/fourier_feature_nets/
ray_caster.py:288-329) uses torch.optim.Adam with L2 weight decay and
applies BOTH value clipping (0.1) and global-norm clipping (0.1) to
the gradients before the step. This module reproduces that update rule
as a pure pytree transformation so the whole optimizer lives inside
the jitted train step.

Order of operations (torch parity):
  1. clip each gradient element to [-clip_value, clip_value]
     (torch.nn.utils.clip_grad_value_)
  2. scale all gradients by clip_norm / (global_norm + 1e-6) if the
     global L2 norm exceeds clip_norm (torch.nn.utils.clip_grad_norm_)
  3. g <- g + weight_decay * param   (torch Adam's L2-style decay)
  4. Adam moment update with bias correction.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["AdamState", "adam_init", "adam_update", "clip_gradients",
           "exponential_lr", "global_norm"]


class AdamState(NamedTuple):
    """Adam moments + step count."""

    step: jnp.ndarray
    mu: object
    nu: object


def adam_init(params) -> AdamState:
    """Zero-initialized Adam state matching the params pytree."""
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                     nu=jax.tree.map(jnp.zeros_like, params))


def global_norm(tree) -> jnp.ndarray:
    """Global L2 norm across a pytree (torch clip_grad_norm_ parity)."""
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(leaf)) for leaf in leaves))


def clip_gradients(grads, clip_value: Optional[float] = None,
                   clip_norm: Optional[float] = None):
    """Value clip then global-norm clip (ray_caster.py:327-328 order)."""
    if clip_value is not None:
        grads = jax.tree.map(
            lambda g: jnp.clip(g, -clip_value, clip_value), grads)
    if clip_norm is not None:
        norm = global_norm(grads)
        scale = jnp.minimum(1.0, clip_norm / (norm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
    return grads


def adam_update(grads, state: AdamState, params, learning_rate,
                beta1: float = 0.9, beta2: float = 0.999,
                eps: float = 1e-8, weight_decay: float = 0.0,
                clip_value: Optional[float] = None,
                clip_norm: Optional[float] = None):
    """One Adam step with torch semantics. Returns (new_params, new_state).

    ``learning_rate`` may be a traced scalar (per-step exponential
    decay computes it inside the jitted step).
    """
    grads = clip_gradients(grads, clip_value, clip_norm)
    if weight_decay:
        grads = jax.tree.map(lambda g, p: g + weight_decay * p,
                             grads, params)

    step = state.step + 1
    t = step.astype(jnp.float32)
    mu = jax.tree.map(lambda m, g: beta1 * m + (1 - beta1) * g,
                      state.mu, grads)
    nu = jax.tree.map(lambda v, g: beta2 * v + (1 - beta2) * jnp.square(g),
                      state.nu, grads)
    bias1 = 1 - beta1 ** t
    bias2 = 1 - beta2 ** t

    def update(p, m, v):
        m_hat = m / bias1
        v_hat = v / bias2
        return p - learning_rate * m_hat / (jnp.sqrt(v_hat) + eps)

    new_params = jax.tree.map(update, params, mu, nu)
    return new_params, AdamState(step=step, mu=mu, nu=nu)


def exponential_lr(initial_learning_rate: float, step, decay_rate: float,
                   decay_steps: float):
    """Keras-style continuous decay: lr0 * rate^(step/steps).

    Parity: utils.py:422-445. ``step`` may be traced.
    """
    step = jnp.asarray(step, jnp.float32)
    return initial_learning_rate * decay_rate ** (step / decay_steps)
