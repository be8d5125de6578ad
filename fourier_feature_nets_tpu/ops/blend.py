"""Volume-rendering blend weights.

The core emission-absorption integral shared by the raycaster and the
hierarchical sampler. Semantics match the reference exactly
(/root/reference/fourier_feature_nets/utils.py:72-97): the final
sample's delta is an effectively-infinite 1e10, transmittance is the
exclusive cumulative product of ``min(1, 1 - alpha + 1e-10)``.

On TPU this is a short exclusive scan along the (small, on-chip)
sample axis; XLA lowers ``cumprod`` over S<=256 to a log-depth scan in
VMEM, so a handwritten Pallas kernel is reserved for the fully-fused
render path (see ops/fused_render.py).
"""

import jax.numpy as jnp

__all__ = ["calculate_blend_weights", "exclusive_cumprod"]


def exclusive_cumprod(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Exclusive cumulative product along ``axis`` (first element = 1)."""
    inclusive = jnp.cumprod(x, axis=axis)
    one = jnp.ones_like(jnp.take(inclusive, jnp.array([0]), axis=axis))
    shifted = jnp.take(inclusive, jnp.arange(x.shape[axis] - 1), axis=axis)
    return jnp.concatenate([one, shifted], axis=axis)


def calculate_blend_weights(t_values: jnp.ndarray,
                            opacity: jnp.ndarray) -> jnp.ndarray:
    """Calculates per-sample blend weights for a batch of rays.

    Args:
        t_values: (..., num_samples) sample depths along each ray.
        opacity: (..., num_samples) opacity (sigma) at each sample.

    Returns:
        (..., num_samples) blend weights ``alpha_i * T_i`` where
        ``T_i`` is the transmittance up to sample ``i``.

    Parity: utils.py:72-97 — deltas padded with 1e10, transmittance
    floor of 1e-10, clamp at 1.
    """
    deltas = t_values[..., 1:] - t_values[..., :-1]
    max_dist = jnp.full_like(deltas[..., :1], 1e10)
    deltas = jnp.concatenate([deltas, max_dist], axis=-1)

    alpha = 1.0 - jnp.exp(-(opacity * deltas))
    trans = jnp.minimum(1.0, 1.0 - alpha + 1e-10)
    trans = exclusive_cumprod(trans, axis=-1)
    return alpha * trans
