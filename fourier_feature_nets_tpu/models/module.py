"""Minimal functional NN layer for the framework.

Models in this framework are *static configuration objects* with pure
``init(rng) -> params`` and ``apply(params, ...) -> outputs`` methods;
parameters are plain pytrees (nested dicts of jnp arrays). This is the
TPU-idiomatic replacement for the reference's stateful
``torch.nn.Module`` hierarchy: a model's forward pass is a pure
function that can be jitted, differentiated, vmapped and sharded
freely, and parameters move through optimizers and checkpoints as
data.
"""

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["linear_init", "linear_apply", "mlp_init", "mlp_apply",
           "logit", "Model"]

Params = Dict[str, jnp.ndarray]


def logit(x: float) -> float:
    """Inverse sigmoid (shared by the voxel models' reference-parity
    bias init, voxels_model.py:26-31)."""
    return float(np.log(x) - np.log1p(-x))


def linear_init(rng: jax.Array, num_inputs: int, num_outputs: int,
                dtype=jnp.float32) -> Params:
    """Initializes a dense layer with torch.nn.Linear's default scheme.

    PyTorch draws both weight and bias from
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (kaiming_uniform with a=sqrt(5));
    matching it keeps optimization trajectories statistically
    comparable to the reference models. Weights are stored (in, out)
    for the x @ W convention.
    """
    w_key, b_key = jax.random.split(rng)
    bound = 1.0 / np.sqrt(num_inputs)
    weight = jax.random.uniform(w_key, (num_inputs, num_outputs), dtype,
                                -bound, bound)
    bias = jax.random.uniform(b_key, (num_outputs,), dtype, -bound, bound)
    return {"weight": weight, "bias": bias}


def linear_apply(params: Params, inputs: jnp.ndarray,
                 compute_dtype=None) -> jnp.ndarray:
    """Applies a dense layer, optionally casting to a compute dtype.

    With ``compute_dtype=jnp.bfloat16`` the matmul runs on the MXU in
    bf16 with f32 accumulation (preferred_element_type), the standard
    TPU mixed-precision recipe; parameters stay f32. With the default
    ``compute_dtype=None`` the matmul runs at HIGHEST precision (true
    f32) for numerical parity with the reference — the models here are
    small enough that full precision is cheap.
    """
    weight, bias = params["weight"], params["bias"]
    if compute_dtype is not None:
        inputs = inputs.astype(compute_dtype)
        weight = weight.astype(compute_dtype)
        precision = None
    else:
        precision = jax.lax.Precision.HIGHEST
    out = jnp.dot(inputs, weight, preferred_element_type=jnp.float32,
                  precision=precision)
    return out + bias


def mlp_init(rng: jax.Array, num_inputs: int,
             layer_channels: Sequence[int], num_outputs: int) -> list:
    """Initializes a ReLU MLP: hidden layers + linear output layer."""
    widths = [num_inputs, *layer_channels, num_outputs]
    keys = jax.random.split(rng, len(widths) - 1)
    return [linear_init(k, n_in, n_out)
            for k, n_in, n_out in zip(keys, widths[:-1], widths[1:])]


def mlp_apply(layers: list, inputs: jnp.ndarray, compute_dtype=None,
              return_hidden: bool = False):
    """Applies a ReLU MLP (linear final layer).

    Args:
        layers: list of dense-layer params.
        inputs: (..., num_inputs) input features.
        compute_dtype: optional matmul dtype (e.g. bfloat16).
        return_hidden: when True, also return the final hidden
            activations (the reference's ``keep_activations`` hook,
            fourier_feature_models.py:74-75).
    """
    hidden = inputs
    for layer in layers[:-1]:
        hidden = jax.nn.relu(linear_apply(layer, hidden, compute_dtype))
    output = linear_apply(layers[-1], hidden, compute_dtype)
    if return_hidden:
        return output, hidden
    return output


class Model:
    """Base class for framework models.

    Subclasses define ``init``/``apply`` and a ``params_manifest``
    (constructor arguments, persisted inside checkpoints so that
    ``load_model`` can reconstruct the model without external config —
    the same self-describing scheme as the reference's ``save``
    methods, fourier_feature_models.py:80-89).
    """

    #: whether apply() takes a view-direction argument
    use_view: bool = False
    #: checkpoint type tag
    model_type: str = "model"

    @property
    def params_manifest(self) -> dict:
        raise NotImplementedError

    def init(self, rng: jax.Array):
        raise NotImplementedError

    def apply(self, params, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, params, *args, **kwargs):
        return self.apply(params, *args, **kwargs)
