"""fourier_feature_nets_tpu: a TPU-native framework for Fourier Feature
Networks and neural volume rendering.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
matajoh/fourier_feature_nets: models, ray sampling, volume rendering,
datasets, training and visualization — engineered for TPU (MXU-shaped
matmuls, on-device sampling, one-jit train steps, data parallelism
over device meshes).
"""

from . import ops
from .cameras import CameraInfo, Ray, Resolution
from .datasets import (
    ImageDataset,
    Mode,
    PixelDataset,
    RayDataset,
    RenderResult,
    SignalDataset,
    generate_synthetic_dataset,
)
from .octree import OcTree
from .render import Raycaster, RaySampler, RaySamples
from .utils import (
    ETABar,
    download_asset,
    exponential_lr,
    hemisphere,
    orbit,
)
from .utils import exponential_lr as exponential_lr_decay
from .visualizers import (
    ActivationVisualizer,
    ComparisonVisualizer,
    EvaluationVisualizer,
    OrbitVideoVisualizer,
    Visualizer,
)
from .models import (
    BasicFourierMLP,
    FourierFeatureMLP,
    GaussianFourierMLP,
    MLP,
    NeRF,
    PositionalFourierMLP,
    Voxels,
    load_model,
    save_model,
)
from .ops import calculate_blend_weights, interpolate_bilinear

from .utils.debug import init_from_env as _init_debug_from_env

_init_debug_from_env()

__version__ = "0.1.0"

__all__ = [
    "ops",
    "CameraInfo",
    "Ray",
    "Resolution",
    "ImageDataset",
    "Mode",
    "PixelDataset",
    "RayDataset",
    "RenderResult",
    "SignalDataset",
    "generate_synthetic_dataset",
    "Raycaster",
    "RaySampler",
    "RaySamples",
    "ETABar",
    "download_asset",
    "exponential_lr",
    "exponential_lr_decay",
    "hemisphere",
    "orbit",
    "OcTree",
    "Visualizer",
    "ActivationVisualizer",
    "ComparisonVisualizer",
    "EvaluationVisualizer",
    "OrbitVideoVisualizer",
    "BasicFourierMLP",
    "FourierFeatureMLP",
    "GaussianFourierMLP",
    "MLP",
    "NeRF",
    "PositionalFourierMLP",
    "Voxels",
    "load_model",
    "save_model",
    "calculate_blend_weights",
    "interpolate_bilinear",
]
