"""The full NeRF model.

Functional re-design of the reference NeRF
(/root/reference/fourier_feature_nets/nerf_model.py:9-135): separate
positional/view encodings (no pi scaling, optional raw-input concat),
a ReLU body with skip connections that re-concatenate the encoded
position, a view-independent opacity head, and a bottleneck ->
encoded-view -> half-width hidden layer -> color head.

Output is (N, 4) raw logits: RGB color logits + opacity logit (the
raycaster applies sigmoid/softplus).
"""

from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.encoding import positional_encoding_matrix
from .module import Model, linear_apply, linear_init

__all__ = ["NeRF", "flagship_nerf"]


class NeRF(Model):
    """NeRF radiance field MLP with view dependence."""

    model_type = "nerf"
    use_view = True

    def __init__(self, num_layers: int, num_channels: int,
                 max_log_scale_pos: float, num_freq_pos: int,
                 max_log_scale_view: float, num_freq_view: int,
                 skips: Sequence[int], include_inputs: bool):
        self.num_layers = num_layers
        self.num_channels = num_channels
        self.max_log_scale_pos = max_log_scale_pos
        self.num_freq_pos = num_freq_pos
        self.max_log_scale_view = max_log_scale_view
        self.num_freq_view = num_freq_view
        self.skips = set(skips)
        self.include_inputs = include_inputs

        self.pos_encoding = jnp.asarray(
            positional_encoding_matrix(max_log_scale_pos, num_freq_pos, 3))
        self.view_encoding = jnp.asarray(
            positional_encoding_matrix(max_log_scale_view, num_freq_view, 3))

        self.num_pos_encoded = 2 * self.pos_encoding.shape[-1] + (
            3 if include_inputs else 0)
        self.num_view_encoded = 2 * self.view_encoding.shape[-1] + (
            3 if include_inputs else 0)

    @property
    def params_manifest(self) -> dict:
        """Constructor arguments, persisted in checkpoints (nerf_model.py:34-43)."""
        return {
            "num_layers": self.num_layers,
            "num_channels": self.num_channels,
            "max_log_scale_pos": self.max_log_scale_pos,
            "num_freq_pos": self.num_freq_pos,
            "max_log_scale_view": self.max_log_scale_view,
            "num_freq_view": self.num_freq_view,
            "skips": sorted(self.skips),
            "include_inputs": self.include_inputs,
        }

    def init(self, rng: jax.Array):
        """Initializes body, opacity, bottleneck, view and color heads."""
        keys = jax.random.split(rng, self.num_layers + 4)
        layers = []
        layer_inputs = self.num_pos_encoded
        for i in range(self.num_layers):
            if i in self.skips:
                layer_inputs += self.num_pos_encoded
            layers.append(linear_init(keys[i], layer_inputs,
                                      self.num_channels))
            layer_inputs = self.num_channels

        return {
            "layers": layers,
            "opacity_out": linear_init(keys[-4], layer_inputs, 1),
            "bottleneck": linear_init(keys[-3], layer_inputs,
                                      self.num_channels),
            "hidden_view": linear_init(
                keys[-2],
                self.num_channels + self.num_view_encoded,
                self.num_channels // 2),
            "color_out": linear_init(keys[-1], self.num_channels // 2, 3),
        }

    def _encode(self, x: jnp.ndarray, encoding: jnp.ndarray) -> jnp.ndarray:
        """[cos(xB), sin(xB)] (+ raw x) — NO pi scale (nerf_model.py:97-109).

        Full-precision matmul: frequencies reach 2**max_log_scale_pos
        (512 by default) where a bf16 matmul pass would corrupt phases.
        """
        encoded = jnp.dot(x, encoding, precision=jax.lax.Precision.HIGHEST)
        parts = [jnp.cos(encoded), jnp.sin(encoded)]
        if self.include_inputs:
            parts.append(x)
        return jnp.concatenate(parts, axis=-1)

    def apply(self, params, position: jnp.ndarray, view: jnp.ndarray,
              compute_dtype=None) -> jnp.ndarray:
        """Queries the radiance field.

        Args:
            params: parameter pytree from ``init``.
            position: (N, 3) positions.
            view: (N, 3) normalized view directions.
            compute_dtype: optional matmul dtype (e.g. bfloat16).

        Returns:
            (N, 4) color + opacity logits.
        """
        encoded_pos = self._encode(position, self.pos_encoding)
        encoded_view = self._encode(view, self.view_encoding)

        outputs = encoded_pos
        for i, layer in enumerate(params["layers"]):
            if i in self.skips:
                outputs = jnp.concatenate([outputs, encoded_pos], axis=-1)
            outputs = jax.nn.relu(linear_apply(layer, outputs, compute_dtype))

        opacity = linear_apply(params["opacity_out"], outputs, compute_dtype)
        bottleneck = linear_apply(params["bottleneck"], outputs,
                                  compute_dtype)

        outputs = jnp.concatenate([bottleneck, encoded_view], axis=-1)
        outputs = jax.nn.relu(
            linear_apply(params["hidden_view"], outputs, compute_dtype))
        color = linear_apply(params["color_out"], outputs, compute_dtype)
        return jnp.concatenate([color, opacity], axis=-1)


def flagship_nerf() -> NeRF:
    """The flagship full-NeRF configuration (train_nerf.py:80-83
    defaults: 8x256, pos 10 freq / log-scale 9, view 4 freq /
    log-scale 3, skip at 4, raw inputs included).

    Single source for the config the benchmarks, driver entry and
    profiling tools all measure — a drifted copy would silently bench
    a different model than training builds.
    """
    return NeRF(num_layers=8, num_channels=256, max_log_scale_pos=9.0,
                num_freq_pos=10, max_log_scale_view=3.0, num_freq_view=4,
                skips=[4], include_inputs=True)
