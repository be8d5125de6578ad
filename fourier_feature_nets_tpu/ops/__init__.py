"""TPU-native compute ops: the numeric core of the framework."""

from .blend import (
    blend_weights_prefix,
    blend_weights_suffix,
    calculate_blend_weights,
    exclusive_cumprod,
)
from .encoding import (
    basic_encoding_matrix,
    fourier_encode,
    gaussian_encoding_matrix,
    positional_encoding_matrix,
)
from .grid_sample import grid_sample_3d
from .interpolation import interpolate_bilinear
from .intersection import NearFar, bounds_min_max, ray_aabb_near_far
from .metrics import mse, psnr, psnr_from_mse
from .sampling import (
    anneal_near_far,
    batch_linspace,
    determine_cdf,
    inverse_cdf_from_bins,
    inverse_cdf_t_values,
    merge_sorted,
    per_ray_uniform,
    sample_positions,
    uniform_t_values,
)

__all__ = [
    "blend_weights_prefix",
    "blend_weights_suffix",
    "calculate_blend_weights",
    "exclusive_cumprod",
    "basic_encoding_matrix",
    "fourier_encode",
    "gaussian_encoding_matrix",
    "positional_encoding_matrix",
    "grid_sample_3d",
    "interpolate_bilinear",
    "NearFar",
    "bounds_min_max",
    "ray_aabb_near_far",
    "mse",
    "psnr",
    "psnr_from_mse",
    "anneal_near_far",
    "batch_linspace",
    "determine_cdf",
    "inverse_cdf_from_bins",
    "inverse_cdf_t_values",
    "merge_sorted",
    "per_ray_uniform",
    "sample_positions",
    "uniform_t_values",
]
