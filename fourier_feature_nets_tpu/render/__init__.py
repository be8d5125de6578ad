"""Rendering engine: ray sampling and the volumetric raycaster."""

from .ray_sampler import RaySampler, RaySamples
from .raycaster import Raycaster

__all__ = ["RaySampler", "RaySamples", "Raycaster"]
