"""Datasets: 1-D signals, 2-D pixels, and 3-D multi-view ray datasets."""

from .image_dataset import ImageDataset
from .pixel_dataset import PixelData, PixelDataset
from .ray_dataset import Mode, RayDataset, RenderResult
from .signal_dataset import SignalData, SignalDataset
from .synthetic import generate_synthetic_dataset, load_or_generate

__all__ = [
    "ImageDataset",
    "PixelData",
    "PixelDataset",
    "Mode",
    "RayDataset",
    "RenderResult",
    "SignalData",
    "SignalDataset",
    "generate_synthetic_dataset",
    "load_or_generate",
]
