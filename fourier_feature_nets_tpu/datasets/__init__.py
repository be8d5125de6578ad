"""Datasets: 1-D signals, 2-D pixels, and 3-D multi-view ray datasets."""

from .pixel_dataset import PixelData, PixelDataset
from .signal_dataset import SignalData, SignalDataset

__all__ = [
    "PixelData",
    "PixelDataset",
    "SignalData",
    "SignalDataset",
]
