"""Radiance-field model family."""

from .fourier import (
    BasicFourierMLP,
    FourierFeatureMLP,
    GaussianFourierMLP,
    MLP,
    PositionalFourierMLP,
)
from .factorized import FactorizedVoxels
from .module import Model, linear_apply, linear_init, mlp_apply, mlp_init
from .nerf import NeRF, flagship_nerf
from .serialization import (load_model, load_torch_model,
                            save_model, save_torch_model)
from .voxels import Voxels

__all__ = [
    "BasicFourierMLP",
    "FactorizedVoxels",
    "FourierFeatureMLP",
    "GaussianFourierMLP",
    "MLP",
    "PositionalFourierMLP",
    "Model",
    "linear_apply",
    "linear_init",
    "mlp_apply",
    "mlp_init",
    "NeRF",
    "flagship_nerf",
    "Voxels",
    "load_model",
    "load_torch_model",
    "save_model",
    "save_torch_model",
]
