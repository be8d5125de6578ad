"""Rendering engine: ray sampling and the volumetric raycaster."""

from .octree_sampler import OctreeRaySampler
from .ray_sampler import RaySampler, RaySamples
from .raycaster import Raycaster

__all__ = ["OctreeRaySampler", "RaySampler", "RaySamples", "Raycaster"]
