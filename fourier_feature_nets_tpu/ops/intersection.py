"""Ray/AABB slab intersection.

TPU-native version of the reference's near/far computation
(/root/reference/fourier_feature_nets/ray_sampler.py:202-232). Where
the reference collects non-intersecting rays into a Python ``set`` —
a dynamic structure incompatible with XLA — we return a boolean
``valid`` mask alongside clamped near/far, keeping every shape static.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = ["NearFar", "ray_aabb_near_far", "bounds_min_max"]


class NearFar(NamedTuple):
    """Entry/exit depths and validity for each ray."""

    near: jnp.ndarray
    far: jnp.ndarray
    valid: jnp.ndarray


def bounds_min_max(bounds: np.ndarray):
    """Computes the AABB corners of a unit cube transformed by ``bounds``.

    Parity: ray_sampler.py:101-104 — min/max corners are the images of
    (-0.5,-0.5,-0.5) and (0.5,0.5,0.5) under the bounds transform (the
    reference assumes axis-aligned scaling + translation).
    """
    bounds = np.asarray(bounds, np.float32)
    lo = bounds @ np.array([-0.5, -0.5, -0.5, 1], np.float32)
    hi = bounds @ np.array([0.5, 0.5, 0.5, 1], np.float32)
    return lo[:3], hi[:3]


def ray_aabb_near_far(starts: jnp.ndarray, directions: jnp.ndarray,
                      bounds_min: jnp.ndarray, bounds_max: jnp.ndarray,
                      min_near: float = 0.1) -> NearFar:
    """Intersects rays with an axis-aligned box via the slab method.

    Args:
        starts: (..., 3) ray origins.
        directions: (..., 3) ray directions (need not be normalized).
        bounds_min: (3,) minimum box corner.
        bounds_max: (3,) maximum box corner.
        min_near: valid rays have their near plane clamped to at least
            this value (ray_sampler.py:229).

    Returns:
        NearFar with (...,) near, far, and valid (near < far before
        clamping). Divisions by zero (x/0) produce +/-inf which flow
        through the max-of-mins / min-of-maxes reduction exactly as in
        the NumPy reference (ray_sampler.py:206-222). 0/0 (an origin
        exactly on a slab plane with a zero direction component on
        that axis) produces NaN, which the reference propagates
        through ``np.max``/``np.min`` so the comparison marks the ray
        INVALID; here such rays are marked invalid explicitly while
        near/far stay finite, so masked downstream arithmetic (and its
        gradients through ``where``) never sees a NaN.
    """
    t0 = (bounds_min - starts) / directions
    t1 = (bounds_max - starts) / directions
    # 0/0 slabs: the reference's NaN-propagating max/min invalidates
    # the whole ray — record that before sanitizing the values.
    degenerate = jnp.any(jnp.isnan(t0) | jnp.isnan(t1), axis=-1)
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    # keep the reductions finite (NaN would win jnp.max on TPU too,
    # but poison downstream masked math); validity is handled above
    near = jnp.where(jnp.isnan(near), -jnp.inf, near)
    far = jnp.where(jnp.isnan(far), jnp.inf, far)
    near = jnp.max(near, axis=-1)
    far = jnp.min(far, axis=-1)
    valid = (near < far) & ~degenerate
    near = jnp.where(valid, jnp.maximum(min_near, near), near)
    return NearFar(near, far, valid)
