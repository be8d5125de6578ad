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
        clamping). Divisions by zero produce +/-inf which fall out of
        the max-of-mins / min-of-maxes reduction exactly as in the
        NumPy reference (ray_sampler.py:206-222).
    """
    t0 = (bounds_min - starts) / directions
    t1 = (bounds_max - starts) / directions
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    # NaNs (0/0) must not poison the reductions: replace with -/+inf so
    # they never win max/min, mirroring NumPy's nan-ignoring where-trick.
    near = jnp.where(jnp.isnan(near), -jnp.inf, near)
    far = jnp.where(jnp.isnan(far), jnp.inf, far)
    near = jnp.max(near, axis=-1)
    far = jnp.min(far, axis=-1)
    valid = near < far
    near = jnp.where(valid, jnp.maximum(min_near, near), near)
    return NearFar(near, far, valid)
