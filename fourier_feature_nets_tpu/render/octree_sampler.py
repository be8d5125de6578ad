"""Octree-accelerated ray sampling (empty-space skipping).

The reference's octree backs its fast-render/visualization path
(SURVEY.md §2.1); here the sparse tree becomes an *importance
distribution for sample placement*: rays are marched through the tree
on device (octree/device.py), and the per-ray sample budget is drawn
by inverse-transform sampling over the traversal intervals, weighting
occupied leaves ~1000x over empty space. Renders concentrate their
model queries where matter can exist — the NerfAcc-style occupancy
speedup, expressed with fixed shapes so the whole pipeline jits.
"""

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import CameraInfo
from ..octree.device import device_batch_intersect
from ..octree.octree import OcTree
from ..ops.sampling import inverse_cdf_from_bins, per_ray_uniform
from .ray_sampler import RaySampler, RaySamples

__all__ = ["OctreeRaySampler", "occupancy_t_values"]


def occupancy_t_values(t_stops: jnp.ndarray, leaves: jnp.ndarray,
                       num_samples: int, rng: Optional[jax.Array] = None,
                       empty_weight: float = 1e-3,
                       quantiles: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
    """Draws sample depths concentrated in occupied tree intervals.

    Args:
        t_stops: (R, L) interval entry depths from the tree tracer.
        leaves: (R, L) leaf index per interval (-1 = empty space).
        num_samples: samples per ray.
        rng: PRNG key for stratified quantiles; None = even spacing.
        empty_weight: relative sampling mass of empty intervals
            (nonzero so the renderer can still correct octree
            false-negatives).
        quantiles: optional precomputed SORTED (R, num_samples)
            quantiles in [0, 1) (e.g. stratified per-ray draws for
            layout invariance); overrides ``rng``.

    Returns:
        (R, num_samples) sorted t values.
    """
    lengths = jnp.maximum(t_stops[:, 1:] - t_stops[:, :-1], 0.0)
    occupied = leaves[:, :-1] >= 0
    weights = lengths * jnp.where(occupied, 1.0, empty_weight) + 1e-12
    cdf = jnp.cumsum(weights, axis=-1)
    cdf = cdf / cdf[:, -1:]
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)
    # stratified quantiles are sorted by construction, so the inverse
    # CDF output is too — per-ray jnp.sort is a full bitonic network
    # on TPU (CLAUDE.md) and is deliberately avoided here
    return inverse_cdf_from_bins(t_stops, cdf, num_samples, rng,
                                 stratified_quantiles=True,
                                 quantiles=quantiles)


class OctreeRaySampler(RaySampler):
    """RaySampler whose sample placement skips empty space using a
    sparse octree."""

    def __init__(self, tree: OcTree, cameras: List[CameraInfo],
                 num_samples: int, stratified: bool = False,
                 max_length: int = 64, empty_weight: float = 1e-3,
                 bounds: Optional[np.ndarray] = None):
        """Constructor.

        Args:
            tree: occupancy octree (e.g. from voxelize_model).
            cameras: scene cameras.
            num_samples: samples per ray.
            stratified: jitter the occupancy quantiles.
            max_length: maximum tree intervals recorded per ray.
            empty_weight: relative mass of empty intervals.
            bounds: render volume transform; defaults to the tree's
                cube.
        """
        if bounds is None:
            side = 2 * tree.scale
            bounds = np.diag([side, side, side, 1.0]).astype(np.float32)
        super().__init__(bounds, cameras, num_samples, stratified)
        self.tree = tree
        self.max_length = max_length
        self.empty_weight = empty_weight
        self._node_index = jnp.asarray(tree._node_index)
        self._leaf_index = jnp.asarray(tree._leaf_index)
        self._tree_scale = float(tree.scale)
        self._tree_depth = tree.depth

    def sample(self, idx, step=None,
               rng: Optional[jax.Array] = None) -> RaySamples:
        """Samples rays with octree-guided depth placement
        (pure/jit-safe)."""
        idx = jnp.asarray(idx)
        return self._sample_geometry(
            self.starts[idx], self.directions[idx], self.near[idx],
            self.far[idx], idx, step, rng)

    def _sample_geometry(self, starts, directions, near, far, idx,
                         step, rng, cdf_rows=None):
        """Octree-guided sampling on explicit ray geometry, so the
        whole-frame and free-pose paths (``sample_camera_rays`` /
        ``sample_pose_rays``) place samples exactly like the indexed
        :meth:`sample` instead of falling back to uniform spacing."""
        del step, cdf_rows  # no annealing / focus tables on this path
        path = device_batch_intersect(
            self._node_index, self._leaf_index, starts, directions,
            scale=self._tree_scale, max_depth=self._tree_depth,
            max_length=self.max_length)

        # layout-invariant stratified quantiles: keyed by ray id (not
        # batch slot) so every data-parallel sharding draws identical
        # samples per ray (see ops.sampling.per_ray_uniform)
        quantiles = None
        if self.stratified and rng is not None and idx is not None:
            jitter = per_ray_uniform(rng, jnp.asarray(idx),
                                     self.num_samples)
            quantiles = ((jnp.arange(self.num_samples) + jitter)
                         / self.num_samples)
        quantile_rng = rng if (self.stratified and rng is not None) \
            else None
        t_values = occupancy_t_values(path.t_stops, path.leaves,
                                      self.num_samples, quantile_rng,
                                      self.empty_weight, quantiles)
        # clamp into the valid near/far range of the render volume
        t_values = jnp.clip(t_values, near[:, None], far[:, None])

        positions = (starts[:, None, :]
                     + t_values[..., None] * directions[:, None, :])
        view_directions = jnp.broadcast_to(directions[:, None, :],
                                           positions.shape)
        return RaySamples(positions, view_directions, t_values, idx)
