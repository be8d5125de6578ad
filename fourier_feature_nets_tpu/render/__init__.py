"""Rendering engine: ray sampling and the volumetric raycaster."""

from .distill import distill
from .occupancy_sampler import (
    OccupancyGridSampler,
    density_grid_from_model,
    occupancy_grid_from_tree,
)
from .octree_sampler import OctreeRaySampler
from .ray_sampler import RaySampler, RaySamples
from .raycaster import Raycaster
from .server import RenderServer

__all__ = ["OccupancyGridSampler", "OctreeRaySampler", "RaySampler",
           "RaySamples", "Raycaster", "RenderServer",
           "density_grid_from_model", "distill",
           "occupancy_grid_from_tree"]
