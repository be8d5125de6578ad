"""Occupancy-grid accelerated ray sampling.

The octree-descent sampler (octree_sampler.py) is exact but its
per-sample tree walk (scan x descent x searchsorted) is
gather-latency-bound at scale — measured ~37 s for an 800^2 frame.
This sampler rasterizes the SAME octree into a dense 0/1 occupancy
volume once (host-side C++ queries), and places samples by:

  1. probing P uniform depths along each ray (one trilinear grid read
     per probe — pure vectorized gathers),
  2. building a per-ray CDF weighted by probe occupancy,
  3. inverse-transform sampling the per-ray budget from that CDF.

Everything is fixed-shape jnp; an 800^2 frame's sample placement costs
milliseconds and the model query becomes the floor. This is the
binarized-occupancy-grid recipe of the efficient-sampling literature
(NerfAcc), expressed in the framework's existing CDF machinery.
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import CameraInfo
from ..octree.octree import OcTree
from ..ops.grid_sample import grid_sample_3d
from ..ops.sampling import batch_linspace, inverse_cdf_from_bins
from .ray_sampler import RaySampler, RaySamples

__all__ = ["occupancy_grid_from_tree", "OccupancyGridSampler"]


def occupancy_grid_from_tree(tree: OcTree, resolution: int = 64,
                             dilate: int = 1) -> np.ndarray:
    """Rasterizes octree occupancy into a dense (R, R, R) 0/1 volume.

    Cell centers are point-queried against the tree (C++ kernel);
    ``dilate`` grows occupancy by that many cells in every direction
    so surfaces near cell borders are never missed.
    """
    coords = (np.arange(resolution) + 0.5) / resolution * 2 - 1
    coords = coords * tree.scale
    zz, yy, xx = np.meshgrid(coords, coords, coords, indexing="ij")
    points = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    occupied = (tree.query(points) >= 0).astype(np.float32)
    grid = occupied.reshape(resolution, resolution, resolution)

    for _ in range(dilate):
        padded = np.pad(grid, 1)
        grown = grid.copy()
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    grown = np.maximum(
                        grown,
                        padded[1 + dz:1 + dz + resolution,
                               1 + dy:1 + dy + resolution,
                               1 + dx:1 + dx + resolution])
        grid = grown
    return grid


class OccupancyGridSampler(RaySampler):
    """RaySampler that concentrates samples in occupied space using a
    dense occupancy volume derived from an octree."""

    def __init__(self, tree: OcTree, cameras: List[CameraInfo],
                 num_samples: int, stratified: bool = False,
                 grid_resolution: int = 64, num_probes: int = 32,
                 empty_weight: float = 1e-2, trilinear: bool = False,
                 bounds: Optional[np.ndarray] = None):
        """Constructor.

        Args:
            tree: occupancy octree (e.g. voxelize_model output).
            cameras: scene cameras.
            num_samples: samples per ray.
            stratified: jitter the CDF quantiles.
            grid_resolution: dense occupancy raster resolution.
            num_probes: uniform depth probes per ray for the CDF.
            empty_weight: relative mass of unoccupied probes.
            trilinear: interpolate occupancy (8 gathers/probe) instead
                of nearest-neighbor lookup (1 gather/probe). Nearest
                is the default — occupancy is binary and pre-dilated,
                and probing is gather-throughput-bound on TPU.
            bounds: render volume; defaults to the tree's cube.
        """
        if bounds is None:
            side = 2 * tree.scale
            bounds = np.diag([side, side, side, 1.0]).astype(np.float32)
        super().__init__(bounds, cameras, num_samples, stratified)
        self.tree = tree
        self.num_probes = num_probes
        self.empty_weight = empty_weight
        self.trilinear = trilinear
        self._grid_scale = float(tree.scale)
        self._grid_resolution = grid_resolution
        grid = occupancy_grid_from_tree(tree, grid_resolution)
        self.occupancy = jnp.asarray(grid[..., None])
        self.occupancy_flat = jnp.asarray(grid.reshape(-1))

    def _occupancy_at(self, points: jnp.ndarray) -> jnp.ndarray:
        """Occupancy at (..., 3) world points."""
        res = self._grid_resolution
        flat_pts = points.reshape(-1, 3)
        if self.trilinear:
            occ = grid_sample_3d(self.occupancy,
                                 flat_pts / self._grid_scale)[:, 0]
        else:
            cell = jnp.clip(
                ((flat_pts / self._grid_scale + 1.0) * 0.5 * res)
                .astype(jnp.int32), 0, res - 1)
            flat_idx = ((cell[:, 2] * res + cell[:, 1]) * res
                        + cell[:, 0])
            occ = self.occupancy_flat[flat_idx]
        return occ.reshape(points.shape[:-1])

    def sample(self, idx, step=None,
               rng: Optional[jax.Array] = None) -> RaySamples:
        """Occupancy-weighted inverse-CDF sampling (pure/jit-safe)."""
        idx = jnp.asarray(idx)
        starts = self.starts[idx]
        directions = self.directions[idx]
        near = self.near[idx]
        far = self.far[idx]

        # uniform probe bins over [near, far]
        edges = batch_linspace(near, far, self.num_probes + 1)
        mids = 0.5 * (edges[..., :-1] + edges[..., 1:])
        probe_pos = (starts[:, None, :]
                     + mids[..., None] * directions[:, None, :])
        occ = self._occupancy_at(probe_pos)

        lengths = edges[..., 1:] - edges[..., :-1]
        weights = lengths * (occ + self.empty_weight) + 1e-12
        cdf = jnp.cumsum(weights, axis=-1)
        cdf = cdf / cdf[..., -1:]
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf],
                              axis=-1)

        quantile_rng = rng if (self.stratified and rng is not None) \
            else None
        # stratified monotone quantiles: sorted by construction, so
        # the (expensive on TPU) per-ray sort is unnecessary
        t_values = inverse_cdf_from_bins(edges, cdf, self.num_samples,
                                         quantile_rng,
                                         stratified_quantiles=True)

        positions = (starts[:, None, :]
                     + t_values[..., None] * directions[:, None, :])
        view_directions = jnp.broadcast_to(directions[:, None, :],
                                           positions.shape)
        return RaySamples(positions, view_directions, t_values, idx)
