"""Rendering engine: ray sampling and the volumetric raycaster."""

from .occupancy_sampler import (
    OccupancyGridSampler,
    density_grid_from_model,
    occupancy_grid_from_tree,
)
from .octree_sampler import OctreeRaySampler
from .ray_sampler import RaySampler, RaySamples
from .raycaster import Raycaster

__all__ = ["OccupancyGridSampler", "OctreeRaySampler", "RaySampler",
           "RaySamples", "Raycaster", "density_grid_from_model",
           "occupancy_grid_from_tree"]
