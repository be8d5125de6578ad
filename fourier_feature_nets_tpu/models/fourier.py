"""The Fourier Feature MLP family.

Functional re-design of the reference model family
(/root/reference/fourier_feature_nets/fourier_feature_models.py):
an MLP preceded by gamma(x) = [a*cos(pi x B), a*sin(pi x B)]. The
(a, B) matrices are *static buffers* captured in the model config (not
trained), so on TPU the encode fuses with the first matmul into a
single MXU pipeline under jit.
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.encoding import (
    basic_encoding_matrix,
    fourier_encode,
    gaussian_encoding_matrix,
    positional_encoding_matrix,
)
from .module import Model, mlp_apply, mlp_init

__all__ = [
    "FourierFeatureMLP",
    "MLP",
    "BasicFourierMLP",
    "PositionalFourierMLP",
    "GaussianFourierMLP",
]


class FourierFeatureMLP(Model):
    """MLP with a Fourier-feature preprocessing stage.

    Parity: fourier_feature_models.py:10-89. ``b_values`` is
    (num_inputs, E); ``a_values`` is (E,). When ``b_values`` is None
    the inputs pass through unencoded (plain MLP).
    """

    model_type = "fourier"
    use_view = False

    def __init__(self, num_inputs: int, num_outputs: int,
                 a_values: Optional[np.ndarray],
                 b_values: Optional[np.ndarray],
                 layer_channels: List[int]):
        self.num_inputs = num_inputs
        self.num_outputs = num_outputs
        self.layer_channels = list(layer_channels)
        if b_values is None:
            self.a_values = None
            self.b_values = None
            self.num_encoded = num_inputs
        else:
            b_values = np.asarray(b_values, np.float32)
            a_values = np.asarray(a_values, np.float32)
            assert b_values.shape[0] == num_inputs
            assert a_values.shape[0] == b_values.shape[1]
            self.a_values = jnp.asarray(a_values)
            self.b_values = jnp.asarray(b_values)
            self.num_encoded = b_values.shape[1] * 2

    @property
    def params_manifest(self) -> dict:
        """Constructor arguments, persisted in checkpoints."""
        return {
            "num_inputs": self.num_inputs,
            "num_outputs": self.num_outputs,
            "a_values": None if self.a_values is None
            else np.asarray(self.a_values).tolist(),
            "b_values": None if self.b_values is None
            else np.asarray(self.b_values).tolist(),
            "layer_channels": self.layer_channels,
        }

    def init(self, rng: jax.Array):
        """Initializes the MLP parameter pytree."""
        return {"layers": mlp_init(rng, self.num_encoded,
                                   self.layer_channels, self.num_outputs)}

    def encode(self, inputs: jnp.ndarray) -> jnp.ndarray:
        """Applies the Fourier feature encoding (or identity)."""
        if self.b_values is None:
            return inputs
        return fourier_encode(inputs, self.b_values, self.a_values,
                              scale=np.pi)

    def apply(self, params, inputs: jnp.ndarray, compute_dtype=None,
              return_hidden: bool = False) -> jnp.ndarray:
        """Predicts (..., num_outputs) from (..., num_inputs) coords."""
        return mlp_apply(params["layers"], self.encode(inputs),
                         compute_dtype, return_hidden)


class MLP(FourierFeatureMLP):
    """Unencoded baseline MLP (fourier_feature_models.py:92-109)."""

    def __init__(self, num_inputs: int, num_outputs: int, num_layers=3,
                 num_channels=256):
        super().__init__(num_inputs, num_outputs, None, None,
                         [num_channels] * num_layers)


class BasicFourierMLP(FourierFeatureMLP):
    """Inputs projected onto the unit circle (fourier_feature_models.py:112-131)."""

    def __init__(self, num_inputs: int, num_outputs: int, num_layers=3,
                 num_channels=256):
        super().__init__(num_inputs, num_outputs,
                         np.ones(num_inputs, np.float32),
                         basic_encoding_matrix(num_inputs),
                         [num_channels] * num_layers)


class PositionalFourierMLP(FourierFeatureMLP):
    """Axis-aligned log-scale positional encoding (fourier_feature_models.py:134-166)."""

    def __init__(self, num_inputs: int, num_outputs: int,
                 max_log_scale: float, num_layers=3, num_channels=256,
                 embedding_size=256):
        b_values = positional_encoding_matrix(
            max_log_scale, embedding_size // num_inputs, num_inputs)
        a_values = np.ones(b_values.shape[1], np.float32)
        super().__init__(num_inputs, num_outputs, a_values, b_values,
                         [num_channels] * num_layers)


class GaussianFourierMLP(FourierFeatureMLP):
    """Full random-Gaussian encoding (fourier_feature_models.py:169-191)."""

    def __init__(self, num_inputs: int, num_outputs: int, sigma: float,
                 num_layers=3, num_channels=256, embedding_size=256,
                 rng: Optional[jax.Array] = None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        b_values = gaussian_encoding_matrix(rng, sigma, num_inputs,
                                            embedding_size)
        a_values = np.ones(b_values.shape[1], np.float32)
        super().__init__(num_inputs, num_outputs, a_values, b_values,
                         [num_channels] * num_layers)
