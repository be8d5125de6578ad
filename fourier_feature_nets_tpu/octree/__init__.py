"""Sparse octree: native C++ build/traversal + on-device JAX kernels."""

from .device import Path, device_batch_intersect, device_batch_query
from .octree import OcTree

__all__ = ["OcTree", "Path", "device_batch_intersect",
           "device_batch_query"]
