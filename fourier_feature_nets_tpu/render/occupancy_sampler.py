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

__all__ = ["occupancy_grid_from_tree", "density_grid_from_model",
           "OccupancyGridSampler"]


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


def density_grid_from_model(model, params, resolution: int = 64,
                            scale: float = 1.0,
                            alpha_threshold: float = 1e-3) -> np.ndarray:
    """Occupancy volume from a trained model's OWN density field.

    Evaluates opacity at the (R, R, R) cell centers in ONE jitted call
    (R=64 is 262k points — milliseconds on the accelerator) and
    thresholds per-cell alpha ``1 - exp(-softplus(sigma) * cell)``.

    This is the right occupancy source for VOLUMETRIC content: the
    voxelize_model octree marks camera-visible depth SURFACES, which
    under-covers translucent interiors — measured on the 800px
    synthetic scene (32-sample renders vs 128-sample brute force at
    40.4 dB): surface-octree CDF 21.4 dB, plain uniform 34.6 dB,
    density grid **39.9 dB** (docs/RESULTS.md). The instant-ngp /
    NerfAcc occupancy-grid recipe, one model sweep instead of a
    train-time cache.
    """
    key = (id(model), resolution, float(scale))
    if key not in _DENSITY_SWEEPS:
        centers = (np.arange(resolution) + 0.5) / resolution * 2 - 1
        centers = centers * scale
        zz, yy, xx = np.meshgrid(centers, centers, centers,
                                 indexing="ij")
        points = jnp.asarray(
            np.stack([xx, yy, zz], -1).reshape(-1, 3)
            .astype(np.float32))

        @jax.jit
        def cell_alpha(params, points):
            if getattr(model, "use_view", False):
                out = model.apply(params, points,
                                  jnp.zeros_like(points))
            else:
                out = model.apply(params, points)
            sigma = jax.nn.softplus(out[:, 3])
            cell = 2.0 * scale / resolution
            return 1.0 - jnp.exp(-sigma * cell)

        _DENSITY_SWEEPS[key] = (points, cell_alpha)
    points, cell_alpha = _DENSITY_SWEEPS[key]
    alpha = np.asarray(cell_alpha(params, points))
    return (alpha > alpha_threshold).astype(np.float32).reshape(
        resolution, resolution, resolution)


# jitted sweep cache: occupancy-guided training refreshes the grid
# every N steps — rebuilding the jit closure per refresh would pay a
# full (remote) XLA compile each time. Keyed by model identity; params
# are an argument. Process-lifetime cache, bounded by model count.
_DENSITY_SWEEPS = {}


class OccupancyGridSampler(RaySampler):
    """RaySampler that concentrates samples in occupied space using a
    dense occupancy volume derived from an octree or from the model's
    own density field (:meth:`from_model`)."""

    def __init__(self, tree: Optional[OcTree], cameras: List[CameraInfo],
                 num_samples: int, stratified: bool = False,
                 grid_resolution: int = 64, num_probes: int = 32,
                 empty_weight: float = 1e-2, trilinear: bool = False,
                 bounds: Optional[np.ndarray] = None,
                 probe_mode: str = "matmul",
                 probe_resolution: int = 32,
                 occupancy_grid: Optional[np.ndarray] = None,
                 grid_scale: Optional[float] = None):
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
                of nearest-neighbor lookup; overrides ``probe_mode``.
            bounds: render volume; defaults to the tree's cube.
            probe_mode: "matmul" (default) evaluates occupancy as a
                one-hot matmul against a max-pooled
                ``probe_resolution``-cubed table — XLA's dynamic
                gather lowers to a scalar loop on TPU (~50 ns/probe
                measured) while the MXU formulation is ~4x faster
                and conservative (max-pooling only ever grows
                occupancy). "gather" keeps the exact
                ``grid_resolution`` lookup.
            probe_resolution: coarse table side for "matmul" mode
                (clamped to ``grid_resolution``).
        """
        if occupancy_grid is None:
            grid_scale = float(tree.scale)
        elif grid_scale is None:
            raise ValueError("grid_scale is required with an explicit "
                             "occupancy_grid")
        if bounds is None:
            side = 2 * grid_scale
            bounds = np.diag([side, side, side, 1.0]).astype(np.float32)
        super().__init__(bounds, cameras, num_samples, stratified)
        self.tree = tree
        self.num_probes = num_probes
        self.empty_weight = empty_weight
        self.trilinear = trilinear
        self.probe_mode = probe_mode
        self._grid_scale = float(grid_scale)
        if occupancy_grid is None:
            grid = occupancy_grid_from_tree(tree, grid_resolution)
        else:
            grid = np.asarray(occupancy_grid, np.float32)
        self._probe_target = min(probe_resolution,
                                 int(grid.shape[0]))
        self.set_occupancy_grid(grid)

    def set_occupancy_grid(self, grid: np.ndarray) -> None:
        """(Re)installs the occupancy volume and its derived tables.

        Same-shape refreshes swap device arrays in place, so a
        compiled step that receives them as jit ARGUMENTS (the
        _train_data pattern) picks up the new occupancy WITHOUT
        recompiling — the mechanism behind occupancy-guided training's
        periodic grid updates from the live model."""
        grid = np.asarray(grid, np.float32)
        grid_resolution = int(grid.shape[0])
        self._grid_resolution = grid_resolution
        self.occupancy = jnp.asarray(grid[..., None])
        self.occupancy_flat = jnp.asarray(grid.reshape(-1))

        side = min(self._probe_target, grid_resolution)
        factor = grid_resolution // side
        side = grid_resolution // factor
        coarse = grid.reshape(side, factor, side, factor,
                              side, factor).max((1, 3, 5))
        self._probe_resolution = side
        # 128-lane layout: flat cell id = (z*side + y)*side + x, row =
        # id // 128, lane = id % 128. A full 128-wide N keeps every MXU
        # column busy (the previous (z*side+y, x) layout used only
        # ``side`` lanes — 4x the rows for the same FLOPs, measured
        # ~3.5x slower at side=32).
        flat_table = coarse.reshape(-1).astype(np.float32)
        lanes = 128
        rows = -(-flat_table.size // lanes)
        flat_table = np.pad(flat_table, (0, rows * lanes
                                         - flat_table.size))
        self._probe_lanes = lanes
        self.probe_table = jnp.asarray(flat_table.reshape(rows, lanes))

    @classmethod
    def from_model(cls, model, params, cameras: List[CameraInfo],
                   num_samples: int, stratified: bool = False,
                   grid_resolution: int = 64,
                   alpha_threshold: float = 1e-3,
                   empty_weight: float = 0.1,
                   scale: float = 1.0,
                   bounds: Optional[np.ndarray] = None,
                   **kwargs) -> "OccupancyGridSampler":
        """Sampler guided by the model's own density field — no octree
        intermediate (see :func:`density_grid_from_model` for the
        measured quality rationale). ``empty_weight`` defaults higher
        than tree mode (0.1 vs 1e-2): density grids are exact where
        the model is, so residual mass in empty bins only needs to
        cover threshold effects, but starving them was the measured
        failure mode of over-concentration."""
        grid = density_grid_from_model(model, params, grid_resolution,
                                       scale, alpha_threshold)
        return cls(None, cameras, num_samples, stratified,
                   empty_weight=empty_weight, bounds=bounds,
                   occupancy_grid=grid, grid_scale=scale, **kwargs)

    def _occupancy_matmul(self, flat_pts: jnp.ndarray) -> jnp.ndarray:
        """Occupancy via one-hot matmuls on the coarse table.

        One-hot construction is an integer compare against an iota
        (VPU); the row fetch rides the MXU. Probes are processed in
        fixed 16384-wide blocks so the one-hot intermediate stays
        ~32 MB regardless of call size.
        """
        side = self._probe_resolution
        lanes = self._probe_lanes
        num_rows = self.probe_table.shape[0]
        cell = jnp.clip(
            ((flat_pts / self._grid_scale + 1.0) * 0.5 * side)
            .astype(jnp.int32), 0, side - 1)
        flat = (cell[:, 2] * side + cell[:, 1]) * side + cell[:, 0]
        row = flat // lanes
        lane = flat % lanes
        num_points = flat.shape[0]
        block = 16384
        pad = (-num_points) % block
        if pad:
            row = jnp.pad(row, (0, pad))
            lane = jnp.pad(lane, (0, pad))
        iota_row = jnp.arange(num_rows, dtype=jnp.int32)
        iota_lane = jnp.arange(lanes, dtype=jnp.int32)
        table = self.probe_table.astype(jnp.bfloat16)

        def probe_block(args):
            row_b, lane_b = args
            onehot = (row_b[:, None] == iota_row).astype(jnp.bfloat16)
            rows = jax.lax.dot(onehot, table,
                               preferred_element_type=jnp.float32)
            sel = (lane_b[:, None] == iota_lane).astype(rows.dtype)
            return jnp.sum(rows * sel, -1)

        occ = jax.lax.map(probe_block, (row.reshape(-1, block),
                                        lane.reshape(-1, block)))
        return occ.reshape(-1)[:num_points]

    def _occupancy_at(self, points: jnp.ndarray) -> jnp.ndarray:
        """Occupancy at (..., 3) world points."""
        res = self._grid_resolution
        flat_pts = points.reshape(-1, 3)
        if self.trilinear:
            occ = grid_sample_3d(self.occupancy,
                                 flat_pts / self._grid_scale)[:, 0]
        elif self.probe_mode == "matmul":
            occ = self._occupancy_matmul(flat_pts)
        else:
            cell = jnp.clip(
                ((flat_pts / self._grid_scale + 1.0) * 0.5 * res)
                .astype(jnp.int32), 0, res - 1)
            flat_idx = ((cell[:, 2] * res + cell[:, 1]) * res
                        + cell[:, 0])
            occ = self.occupancy_flat[flat_idx]
        return occ.reshape(points.shape[:-1])

    def probe_cdf(self, idx: jnp.ndarray):
        """Probes occupancy along the requested rays (pure/jit-safe).

        Returns:
            (edges, cdf, hit): (R, P+1) probe bin edges, (R, P+1)
            occupancy-weighted CDF over them, and an (R,) bool marking
            rays whose probes touched ANY occupied cell. ``hit`` is
            the empty-space-culling signal: a ray with no occupied
            probe can only integrate (conservatively dilated) empty
            space, so renderers may skip its model queries entirely.
        """
        idx = jnp.asarray(idx)
        return self._probe_cdf_geometry(
            self.starts[idx], self.directions[idx], self.near[idx],
            self.far[idx])

    def _probe_cdf_geometry(self, starts, directions, near, far):
        """:meth:`probe_cdf` on explicit ray geometry (no gathers)."""
        # uniform probe bins over [near, far]
        edges = batch_linspace(near, far, self.num_probes + 1)
        mids = 0.5 * (edges[..., :-1] + edges[..., 1:])
        probe_pos = (starts[:, None, :]
                     + mids[..., None] * directions[:, None, :])
        occ = self._occupancy_at(probe_pos)
        hit = jnp.max(occ, axis=-1) > 0

        lengths = edges[..., 1:] - edges[..., :-1]
        weights = lengths * (occ + self.empty_weight) + 1e-12
        cdf = jnp.cumsum(weights, axis=-1)
        cdf = cdf / cdf[..., -1:]
        cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf],
                              axis=-1)
        return edges, cdf, hit

    def t_from_cdf(self, edges: jnp.ndarray, cdf: jnp.ndarray,
                   rng: Optional[jax.Array] = None,
                   idx: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Draws the per-ray sample budget from a probe CDF.

        Stratified jitter is keyed by GLOBAL ray index when ``idx`` is
        given (``per_ray_uniform``), so every data-parallel layout
        draws identical samples for the same (seed, ray) — the same
        layout-invariance contract as the uniform path
        (ray_sampler.sample)."""
        quantiles = None
        if self.stratified and rng is not None and idx is not None:
            from ..ops.sampling import per_ray_uniform
            u = per_ray_uniform(rng, idx, self.num_samples, salt=2)
            strata = jnp.arange(self.num_samples, dtype=u.dtype)
            quantiles = (strata + u) / self.num_samples
        quantile_rng = rng if (self.stratified and rng is not None) \
            else None
        # stratified monotone quantiles: sorted by construction, so
        # the (expensive on TPU) per-ray sort is unnecessary
        return inverse_cdf_from_bins(edges, cdf, self.num_samples,
                                     quantile_rng,
                                     stratified_quantiles=True,
                                     quantiles=quantiles)

    def sample(self, idx, step=None,
               rng: Optional[jax.Array] = None) -> RaySamples:
        """Occupancy-weighted inverse-CDF sampling (pure/jit-safe)."""
        idx = jnp.asarray(idx)
        return self._sample_geometry(
            self.starts[idx], self.directions[idx], self.near[idx],
            self.far[idx], idx, step, rng)

    def _sample_geometry(self, starts, directions, near, far, idx,
                         step, rng, cdf_rows=None):
        """Occupancy sampling on explicit geometry — the gather-free
        whole-frame path enters here via
        :meth:`RaySampler.sample_camera_rays`."""
        del step, cdf_rows  # no annealing / focus tables here: sample
        # placement is fully geometry-derived (probe CDF), so the
        # free-pose path needs no per-rig data
        edges, cdf, _ = self._probe_cdf_geometry(starts, directions,
                                                 near, far)
        t_values = self.t_from_cdf(edges, cdf, rng, idx)
        positions = (starts[:, None, :]
                     + t_values[..., None] * directions[:, None, :])
        view_directions = jnp.broadcast_to(directions[:, None, :],
                                           positions.shape)
        return RaySamples(positions, view_directions, t_values, idx)
