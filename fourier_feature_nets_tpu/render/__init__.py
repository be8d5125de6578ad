"""Rendering engine: ray sampling and the volumetric raycaster."""

from .occupancy_sampler import OccupancyGridSampler
from .octree_sampler import OctreeRaySampler
from .ray_sampler import RaySampler, RaySamples
from .raycaster import Raycaster

__all__ = ["OccupancyGridSampler", "OctreeRaySampler", "RaySampler",
           "RaySamples", "Raycaster"]
