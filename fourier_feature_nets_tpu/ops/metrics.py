"""Quality metrics."""

import jax.numpy as jnp

__all__ = ["mse", "psnr", "psnr_from_mse"]


def mse(prediction: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error."""
    return jnp.mean(jnp.square(prediction - target))


def psnr_from_mse(value) -> jnp.ndarray:
    """PSNR = -10 * log10(mse).

    Parity: ray_caster.py:244-246, pixel_dataset.py:189-199.
    """
    return -10.0 * jnp.log10(value)


def psnr(prediction: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio between prediction and target."""
    return psnr_from_mse(mse(prediction, target))
