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

__all__ = ["calculate_blend_weights", "exclusive_cumprod",
           "blend_weights_prefix", "blend_weights_suffix"]


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


def blend_weights_prefix(t_values: jnp.ndarray,
                         opacity: jnp.ndarray):
    """Blend weights for the FIRST K samples of each ray, plus the
    outgoing transmittance after them.

    The emission-absorption product is associative, so a ray's
    integral splits exactly at any sample boundary: the prefix
    weights here are BIT-IDENTICAL to the first K entries of
    :func:`calculate_blend_weights` on the full ray (the prefix of a
    ``cumprod`` is the same multiply chain), and ``trans_out`` is the
    transmittance entering sample K. Used by the early-ray-termination
    frame path (render/raycaster.py) to decide which rays are already
    opaque after a partial sample budget.

    Args:
        t_values: (..., S) FULL sample depths (S > K: the delta of
            sample K-1 is ``t[K] - t[K-1]``, exactly as in the
            unsplit integral).
        opacity: (..., K) opacity at the first K samples.

    Returns:
        (weights (..., K), trans_out (...,)).
    """
    k = opacity.shape[-1]
    deltas = t_values[..., 1:k + 1] - t_values[..., :k]
    alpha = 1.0 - jnp.exp(-(opacity * deltas))
    terms = jnp.minimum(1.0, 1.0 - alpha + 1e-10)
    inclusive = jnp.cumprod(terms, axis=-1)
    one = jnp.ones_like(inclusive[..., :1])
    trans_in = jnp.concatenate([one, inclusive[..., :-1]], axis=-1)
    return alpha * trans_in, inclusive[..., -1]


def blend_weights_suffix(t_values: jnp.ndarray,
                         opacity: jnp.ndarray) -> jnp.ndarray:
    """Blend weights for the LAST K samples of each ray, NOT scaled
    by the transmittance entering them.

    The caller composites ``prefix_color + trans_out * suffix_color``
    (:func:`blend_weights_prefix`); the scale-once-at-the-end
    grouping reorders one float multiply per sample versus the
    unsplit product, so results agree to ULPs (not bitwise). The last
    sample's delta is the reference's 1e10 pad.

    Args:
        t_values: (..., S) FULL sample depths (S > K).
        opacity: (..., K) opacity at the last K samples.

    Returns:
        (..., K) un-scaled suffix weights.
    """
    k = opacity.shape[-1]
    deltas = t_values[..., -k + 1:] - t_values[..., -k:-1] \
        if k > 1 else t_values[..., :0]
    max_dist = jnp.full_like(t_values[..., :1], 1e10)
    deltas = jnp.concatenate([deltas, max_dist], axis=-1)
    alpha = 1.0 - jnp.exp(-(opacity * deltas))
    trans = jnp.minimum(1.0, 1.0 - alpha + 1e-10)
    trans = exclusive_cumprod(trans, axis=-1)
    return alpha * trans
