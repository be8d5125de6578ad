"""Fourier feature encodings.

Builds the (a, B) encoding matrices of the Fourier Feature Network
family and applies gamma(x) = [a*cos(pi x B), a*sin(pi x B)].

Parity notes:
  * The FFN family scales inputs by pi — NOT 2*pi — because its inputs
    span a range of 2 (reference comment at
    /root/reference/fourier_feature_nets/fourier_feature_models.py:62-66).
  * The NeRF encodings apply NO pi scaling and no amplitudes
    (nerf_model.py:97-109); use ``fourier_encode(x, b, scale=1.0)``.

On TPU the encode is a (N, d) @ (d, E) matmul followed by cheap
transcendentals; XLA fuses the sin/cos and concat into the first MLP
matmul's producer, so the encode rides the MXU with no extra HBM
round-trip.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# The encode matmul MUST run at full f32 precision: frequencies reach
# 2**max_log_scale (512 for the NeRF position encoding), so the
# default TPU bf16 matmul pass would perturb phases by multiple
# radians and destroy the encoding. The matmul is tiny ((N,3)@(3,E));
# full precision costs nothing.
_ENCODE_PRECISION = jax.lax.Precision.HIGHEST

__all__ = [
    "positional_encoding_matrix",
    "gaussian_encoding_matrix",
    "basic_encoding_matrix",
    "fourier_encode",
]


def positional_encoding_matrix(max_log_scale: float, num_frequencies: int,
                               num_inputs: int) -> np.ndarray:
    """Axis-aligned log-spaced frequency matrix.

    Produces a (num_inputs, num_frequencies * num_inputs) matrix whose
    columns are ``2**linspace(0, max_log_scale, num_frequencies)``
    times the identity, i.e. each input axis gets every frequency.

    Parity: fourier_feature_models.py:157-166 and nerf_model.py:77-84
    (identical construction; layout is frequency-major, axis-minor).
    """
    frequencies = 2.0 ** np.linspace(0, max_log_scale, num_frequencies,
                                     dtype=np.float64)
    blocks = frequencies[:, None, None] * np.eye(num_inputs)[None]
    return blocks.reshape(-1, num_inputs).T.astype(np.float32)


def gaussian_encoding_matrix(rng: jax.Array, sigma: float, num_inputs: int,
                             embedding_size: int) -> np.ndarray:
    """Random Gaussian frequency matrix ~ N(0, sigma).

    Parity: fourier_feature_models.py:187 (torch.normal), drawn here
    from a JAX PRNG for reproducibility across hosts.
    """
    b = sigma * jax.random.normal(rng, (num_inputs, embedding_size))
    return np.asarray(b, np.float32)


def basic_encoding_matrix(num_inputs: int) -> np.ndarray:
    """Identity frequency matrix (inputs projected onto the unit circle).

    Parity: fourier_feature_models.py:127-128.
    """
    return np.eye(num_inputs, dtype=np.float32)


def fourier_encode(inputs: jnp.ndarray, b_values: jnp.ndarray,
                   a_values: Optional[jnp.ndarray] = None,
                   scale: float = np.pi) -> jnp.ndarray:
    """gamma(x) = [a*cos(scale*x @ B), a*sin(scale*x @ B)].

    Args:
        inputs: (..., num_inputs) coordinates.
        b_values: (num_inputs, E) frequency matrix.
        a_values: optional (E,) amplitudes.
        scale: pre-matmul input scale; pi for the FFN family
            (fourier_feature_models.py:66), 1.0 for NeRF encodings
            (nerf_model.py:97-109).

    Returns:
        (..., 2E) encoded features, cos block first.
    """
    encoded = jnp.dot(scale * inputs, b_values,
                      precision=_ENCODE_PRECISION)
    cos, sin = jnp.cos(encoded), jnp.sin(encoded)
    if a_values is not None:
        cos = a_values * cos
        sin = a_values * sin
    return jnp.concatenate([cos, sin], axis=-1)
