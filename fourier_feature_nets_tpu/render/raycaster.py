"""Differentiable volumetric raycaster and trainer.

TPU re-design of the reference engine
(/root/reference/fourier_feature_nets/ray_caster.py). The entire
training step — ray sampling, model query, volume integral, loss,
gradients, clipping, Adam update and LR schedule — compiles into ONE
jitted device function, erasing the reference's per-step
host->device transfers (ray_caster.py:98) and Python-side batch
bookkeeping. Data parallelism over rays comes from sharding the batch
axis across a ``jax.sharding.Mesh``; XLA inserts the gradient
all-reduce over ICI automatically.
"""

import collections
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..datasets.ray_dataset import Mode, RayDataset, RenderResult
from ..models.module import Model
from ..render.ray_sampler import RaySampler, RaySamples
from ..ops import (
    blend_weights_prefix,
    blend_weights_suffix,
    calculate_blend_weights,
)
from ..utils.optim import adam_init, adam_update, exponential_lr
from ..utils.progress import LogEntry

__all__ = ["Raycaster"]


def _on_tpu() -> bool:
    """Whether compute dispatches to a TPU backend (honoring an
    explicit ``jax_default_device`` override, e.g. CPU tests)."""
    default_device = jax.config.jax_default_device
    if default_device is not None:
        return default_device.platform == "tpu"
    return jax.default_backend() == "tpu"


def _composite(color_o: jnp.ndarray, t_values: jnp.ndarray,
               include_depth: bool) -> RenderResult:
    """Emission-absorption compositing of raw model logits
    (ray_caster.py:68-93 semantics)."""
    num_samples = t_values.shape[-1]
    color = jax.nn.sigmoid(color_o[..., :3])
    opacity = jax.nn.softplus(color_o[..., 3])

    weights = calculate_blend_weights(t_values, opacity)
    output_color = jnp.sum(weights[..., None] * color, axis=-2)
    leading = weights[..., :-1]
    output_alpha = jnp.sum(leading, axis=-1)

    if include_depth:
        cutoff = jnp.argmax(leading, axis=-1)
        cutoff = jnp.where(output_alpha < 0.1, num_samples - 1, cutoff)
        # one-hot contraction instead of take_along_axis: per-row
        # dynamic gathers lower to a ~85 ns/row scalar loop on TPU
        # (CLAUDE.md), which dominates full-dataset depth sweeps
        # (extract_surface); the one-hot matmul is VPU/MXU work
        output_depth = jnp.sum(
            t_values * jax.nn.one_hot(cutoff, num_samples,
                                      dtype=t_values.dtype), axis=-1)
    else:
        output_depth = None

    return RenderResult(output_color, output_alpha, output_depth)


class _LRUCache(collections.OrderedDict):
    """Bounded LRU for compiled render executables.

    A long-lived :class:`Raycaster` (e.g. inside ``RenderServer``)
    accumulates one entry per (sampler, chunk size, cull/early-term
    config, pose mode, mesh) combination in ``_render_fns``; each
    frame entry's closure also strongly references its sampler and so
    keeps that sampler's device tables (per-ray geometry, occupancy
    rasters, CDFs) alive. Without a cap, a server cycling samplers or
    render settings grows TPU executables and device memory forever.
    Evicting least-recently-used entries drops both the executable and
    the closure's sampler reference; a re-request simply recompiles.
    """

    def __init__(self, maxsize: int):
        super().__init__()
        self.maxsize = max(1, int(maxsize))

    def __getitem__(self, key):
        value = super().__getitem__(key)
        self.move_to_end(key)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        self.move_to_end(key)
        while len(self) > self.maxsize:
            self.popitem(last=False)


class Raycaster:
    """Volumetric raycaster: renders rays through a radiance field and
    fits the field to a ray dataset."""

    def __init__(self, model: Model, compute_dtype=None,
                 fused: Optional[bool] = None,
                 fused_train: Optional[bool] = None,
                 remat: bool = False,
                 render_cache_size: int = 16,
                 render_tile: int = 2048,
                 fused_layout: str = "fm"):
        """Constructor.

        Args:
            model: the radiance-field model (color+opacity logits).
            compute_dtype: optional matmul dtype for the model's MLP
                body (e.g. jnp.bfloat16 for MXU speed); None keeps
                full f32 parity.
            fused: route NeRF *inference* renders through the Pallas
                fused kernel (ops/fused_nerf.py) — measured ~2x over
                XLA on v5e. Default None = auto: ON for NeRF models
                when compute dispatches to TPU, OFF elsewhere (the
                kernel is TPU Mosaic; CPU runs would need interpret
                mode).
            fused_train: route NeRF *training* forwards through the
                custom-VJP recompute-backward kernel
                (ops/fused_nerf_train.py). Default None = auto: ON
                for NeRF-on-TPU — measured 6.03 ms/step fused vs
                10.78 ms/step XLA autodiff (1.8x) at the flagship
                batch (1024 rays x 128 samples, v5e,
                docs/RESULTS.md); the fused advantage grows when
                activation memory binds. Pass False to force the XLA
                autodiff path (e.g. for f64-grade numerics checks).
            remat: rematerialize the model forward in the backward
                pass (jax.checkpoint) on the XLA training path —
                trades FLOPs for activation memory, enabling larger
                ray batches (the fused path recomputes by design).
            render_cache_size: max compiled render executables kept
                (LRU). Frame entries pin their sampler's device
                tables, so a long-lived server cycling samplers or
                settings needs the bound; the active sampler's
                entries are always the most recently used and never
                evicted mid-use.
            render_tile: Pallas fused-render tile (rows per grid
                step). 2048 is the VMEM ceiling for the 8x256
                flagship; smaller (distilled) models fit larger tiles
                — measured on a 4x128 student in docs/RESULTS.md
                (§ Distillation).
            fused_layout: "fm" (default) routes fused inference
                through the feature-major kernel
                (ops/fused_nerf_fm.py) — samples ride the lane axis,
                removing the row-major kernel's narrow-row DMA floor
                (1.25x on the 8x256 flagship, 1.6x on a 4x128
                student; docs/RESULTS.md § Feature-major). "rm"
                keeps the original row-major kernel.
        """
        if fused_layout not in ("fm", "rm"):
            raise ValueError(f"fused_layout must be 'fm' or 'rm', "
                             f"got {fused_layout!r}")
        self.fused_layout = fused_layout
        self.model = model
        self.remat = remat
        self.compute_dtype = compute_dtype
        self.render_tile = int(render_tile)
        self._render_fns = _LRUCache(render_cache_size)
        self._fused_weights = None
        # identity key via a STRONG reference: an id() key would go
        # stale when CPython reuses a freed params pytree's address
        # (render(A), drop A, allocate same-shape B at A's address)
        self._fused_params_src = None
        is_nerf = model.model_type == "nerf"
        if fused is None:
            fused = is_nerf and _on_tpu()
        if fused_train is None:
            fused_train = is_nerf and _on_tpu()
        self.fused = fused and is_nerf
        self.fused_train = fused_train and is_nerf

    def _get_fused_weights(self, params):
        """Host-side fused-weight preparation, cached per params
        object (params are immutable pytrees; training produces new
        objects every step). The cache holds the source params alive
        so object identity is a sound key."""
        if self.fused_layout == "fm":
            from ..ops.fused_nerf_fm import (
                prepare_fused_nerf_fm as prepare)
        else:
            from ..ops.fused_nerf import prepare_fused_nerf as prepare
        if self._fused_params_src is not params:
            dtype = (self.compute_dtype if self.compute_dtype is not None
                     else jnp.float32)
            self._fused_weights = prepare(self.model, params,
                                          dtype=dtype)
            self._fused_params_src = params
        return self._fused_weights

    # ------------------------------------------------------------------
    # rendering (pure / jit-safe)
    # ------------------------------------------------------------------

    def render(self, params, ray_samples: RaySamples,
               include_depth: bool = False) -> RenderResult:
        """Renders ray samples through the model.

        Parity: ray_caster.py:48-93 — sigmoid on color logits,
        softplus on opacity, blend weights, alpha excludes the
        absorbing tail sample, depth is the t value of the
        highest-weight sample (last sample where alpha < 0.1).
        """
        num_rays, num_samples = ray_samples.t_values.shape
        positions = ray_samples.positions.reshape(-1, 3)
        if self.model.use_view:
            views = ray_samples.view_directions.reshape(-1, 3)
            color_o = self.model.apply(params, positions, views,
                                       compute_dtype=self.compute_dtype)
        else:
            color_o = self.model.apply(params, positions,
                                       compute_dtype=self.compute_dtype)

        color_o = color_o.reshape(num_rays, num_samples, 4)
        return _composite(color_o, ray_samples.t_values, include_depth)

    def _render_jit(self, include_depth: bool):
        key = (include_depth, self.fused)
        if key not in self._render_fns:
            if self.fused:
                from ..ops.fused_nerf import fused_nerf_apply

                @jax.jit
                def render_fn(weights, positions, view_directions,
                              t_values):
                    flat_pos = positions.reshape(-1, 3)
                    flat_views = view_directions.reshape(-1, 3)
                    color_o = fused_nerf_apply(self.model, weights,
                                               flat_pos, flat_views,
                                               tile=self.render_tile)
                    color_o = color_o.reshape(*t_values.shape, 4)
                    result = _composite(color_o, t_values, include_depth)
                    return (result.color, result.alpha,
                            result.depth if include_depth
                            else result.alpha)
            else:
                @jax.jit
                def render_fn(params, positions, view_directions,
                              t_values):
                    samples = RaySamples(positions, view_directions,
                                         t_values, None)
                    result = self.render(params, samples, include_depth)
                    return (result.color, result.alpha,
                            result.depth if include_depth
                            else result.alpha)
            self._render_fns[key] = render_fn
        return self._render_fns[key]

    def batched_render(self, params, samples: RaySamples, batch_size: int,
                       include_depth: bool) -> RenderResult:
        """Chunked no-grad rendering of arbitrarily many rays.

        Everything stays on device: the ray tensors are padded to a
        multiple of ``batch_size`` once, sliced per chunk as device
        ops, and only the small per-ray OUTPUTS transfer to host (the
        reference ships the full ray geometry host<->device per chunk,
        ray_caster.py:103-138).
        """
        render_fn = self._render_jit(include_depth)
        model_arg = (self._get_fused_weights(params) if self.fused
                     else params)
        num_rays = samples.positions.shape[0]
        pad = (-num_rays) % batch_size
        pos = jnp.asarray(samples.positions)
        views = jnp.asarray(samples.view_directions)
        t_values = jnp.asarray(samples.t_values)
        if pad:
            pos = jnp.pad(pos, ((0, pad), (0, 0), (0, 0)))
            views = jnp.pad(views, ((0, pad), (0, 0), (0, 0)))
            t_values = jnp.pad(t_values, ((0, pad), (0, 0)))

        colors, alphas, depths = [], [], []
        for start in range(0, num_rays + pad, batch_size):
            end = start + batch_size
            color, alpha, depth = render_fn(
                model_arg, pos[start:end], views[start:end],
                t_values[start:end])
            colors.append(color)
            alphas.append(alpha)
            if include_depth:
                depths.append(depth)

        color = np.asarray(jnp.concatenate(colors))[:num_rays]
        alpha = np.asarray(jnp.concatenate(alphas))[:num_rays]
        depth = (np.asarray(jnp.concatenate(depths))[:num_rays]
                 if include_depth else None)
        return RenderResult(color, alpha, depth)

    def extract_surface(self, params, dataset, batch_size: int = 16384,
                        alpha_threshold: float = 0.3):
        """Surface point cloud of a trained model (voxelize fast path).

        TPU re-design of the reference's voxelization sweep
        (voxelize_model.py:60-83, which round-trips every ray batch
        through the host): ALL dataset rays are marched inside ONE
        jitted ``lax.scan`` (depth/alpha/color per ray), surface rays
        (``alpha > alpha_threshold``) are compacted device-side with
        the stable cumsum partition (same trick as the culled frame
        renderer), and a single bulk fetch returns exactly the kept
        rows. Per-ray tables ride as jit arguments (_train_data), so
        this works at 800px dataset scale through the remote runtime.

        Returns:
            (positions, colors): (K, 3) float32 arrays; positions are
            ray origin + depth * direction, colors clipped to [0, 1].
        """
        sampler = dataset.sampler
        pool = np.asarray(dataset.index_pool(), np.int32)
        num = len(pool)
        num_batches = -(-num // batch_size)
        total = num_batches * batch_size
        padded = np.concatenate(
            [pool, np.zeros(total - num, np.int32)])
        batches = jnp.asarray(padded.reshape(num_batches, batch_size))
        valid = jnp.asarray(
            (np.arange(total) < num).reshape(num_batches, batch_size))
        data = self._train_data(dataset)
        model_arg = (self._get_fused_weights(params) if self.fused
                     else params)

        @jax.jit
        def sweep(model_arg, batches, valid, data):
            sampler_t, _ = self._bind_data(dataset, data)

            def body(_, xs):
                idx, ok = xs
                rays = sampler_t.sample(idx, None, None)
                if self.fused:
                    from ..ops.fused_nerf import fused_nerf_apply
                    logits = fused_nerf_apply(
                        self.model, model_arg,
                        rays.positions.reshape(-1, 3),
                        rays.view_directions.reshape(-1, 3),
                        tile=self.render_tile)
                    result = _composite(
                        logits.reshape(*rays.t_values.shape, 4),
                        rays.t_values, True)
                else:
                    result = self.render(model_arg, rays,
                                         include_depth=True)
                # origin/direction recovered from the sample geometry:
                # no per-ray table gathers
                dirs = rays.view_directions[:, 0]
                origin = (rays.positions[:, 0]
                          - rays.t_values[:, :1] * dirs)
                pos = origin + result.depth[:, None] * dirs
                keep = ok & (result.alpha > alpha_threshold)
                return None, (pos, result.color, keep)

            _, (pos, color, keep) = jax.lax.scan(
                body, None, (batches, valid))
            pos = pos.reshape(total, 3)
            color = color.reshape(total, 3)
            keep = keep.reshape(total)
            num_keep = jnp.sum(keep.astype(jnp.int32))
            keep_slot = jnp.cumsum(keep.astype(jnp.int32)) - 1
            drop_slot = (num_keep
                         + jnp.cumsum((~keep).astype(jnp.int32)) - 1)
            slot = jnp.where(keep, keep_slot, drop_slot)
            packed = jnp.zeros((total, 6), jnp.float32).at[slot].set(
                jnp.concatenate([pos, jnp.clip(color, 0.0, 1.0)], -1))
            return packed, num_keep

        packed, num_keep = sweep(model_arg, batches, valid, data)
        count = int(num_keep)
        out = np.asarray(packed[:count])
        return out[:, :3], out[:, 3:]

    def render_image(self, params, sampler: RaySampler, index: int,
                     batch_size: int, color_space: str = "RGB") -> np.ndarray:
        """Renders a full camera image (ray_caster.py:140-159)."""
        camera = index % sampler.num_cameras
        samples = sampler.rays_for_camera(camera)
        pred = self.batched_render(params, samples, batch_size, False)
        return sampler.to_image(camera, pred.color, color_space)

    def _frame_fn(self, sampler: RaySampler, chunk_size: int,
                  cull: bool = False, mesh=None,
                  probe_subsample: int = 1, pose: bool = False,
                  early_term: float = 0.0, early_split: int = 0):
        """Builds (and caches) the single-dispatch frame renderer for
        one sampler geometry.

        With ``pose`` the ``camera`` argument of the compiled function
        is a ``(ray_m, position)`` calibration pytree instead of a rig
        index — one executable serves ANY camera pose at the sampler's
        resolution (see :meth:`render_frame_pose`).

        With ``early_term`` > 0 (requires ``cull``) the hit-ray pass
        is split at sample ``early_split`` (default S//2): rays whose
        transmittance after the prefix falls below ``early_term`` are
        opaque — everything behind them is invisible up to a color
        error bounded by the threshold itself — and skip the model on
        their remaining samples (see ``frame_fn_culled_early``)."""
        if early_term > 0.0 and not cull:
            raise ValueError(
                "early_term requires empty-space culling (a sampler "
                "with probe_cdf, e.g. OccupancyGridSampler, and "
                "cull_empty=True) — the termination pass reuses the "
                "culled path's hit partition")
        if early_term <= 0.0:
            early_split = 0  # inert — normalize so identical frame
            # executables share one cache entry (a spurious key costs
            # a full TPU compile)
        key = ("frame", id(sampler), chunk_size, self.fused, cull,
               probe_subsample, pose, early_term, early_split,
               None if mesh is None else tuple(mesh.devices.flat))
        if key not in self._render_fns:
            import copy

            rays_per_cam = sampler.rays_per_camera
            num_chunks = -(-rays_per_cam // chunk_size)
            total = num_chunks * chunk_size
            height = sampler.image_height
            width = sampler.image_width

            # The sampler's precomputed per-ray geometry (starts,
            # directions, near/far, CDFs, occupancy rasters, ...) is
            # passed as a jit ARGUMENT pytree rather than captured in
            # the closure: closed-over arrays are embedded as
            # constants in the compile payload, which for whole-orbit
            # geometry is hundreds of MB. Only the NAMES are cached —
            # values are re-collected per call (see return below) so
            # same-shape refreshes (set_occupancy_grid) are picked up
            # without recompiling.
            array_names = tuple(
                name for name, value in vars(sampler).items()
                if isinstance(value, jnp.ndarray))

            if self.fused:
                from ..ops.fused_nerf import fused_nerf_apply

                def apply_fn(model_arg, pos, views):
                    return fused_nerf_apply(self.model, model_arg, pos,
                                            views,
                                            tile=self.render_tile)
            elif self.model.use_view:
                def apply_fn(model_arg, pos, views):
                    return self.model.apply(
                        model_arg, pos, views,
                        compute_dtype=self.compute_dtype)
            else:
                def apply_fn(model_arg, pos, views):
                    del views
                    return self.model.apply(
                        model_arg, pos, compute_dtype=self.compute_dtype)

            def make_sampler(geometry):
                traced = copy.copy(sampler)
                for name, value in geometry.items():
                    object.__setattr__(traced, name, value)
                return traced

            if pose:
                def ray_geom(traced, camera, offsets):
                    return traced.pose_ray_geometry(camera[0],
                                                    camera[1], offsets)

                def sample_rays(traced, camera, offsets):
                    return traced.sample_pose_rays(camera[0], camera[1],
                                                   offsets)
            else:
                def ray_geom(traced, camera, offsets):
                    return traced.camera_ray_geometry(camera, offsets)

                def sample_rays(traced, camera, offsets):
                    return traced.sample_camera_rays(camera, offsets)

            def render_chunk(geometry, model_arg, camera, off_chunk):
                # gather-free: ray geometry is COMPUTED from the
                # camera calibration tables (sample_camera_rays) —
                # per-ray table gathers run at ~85 ns/row on TPU and
                # dominated the old frame time (round-2 profile)
                rays, _ = sample_rays(make_sampler(geometry),
                                      camera, off_chunk)
                flat_pos = rays.positions.reshape(-1, 3)
                flat_views = rays.view_directions.reshape(-1, 3)
                color_o = apply_fn(model_arg, flat_pos, flat_views)
                color_o = color_o.reshape(off_chunk.shape[0], -1, 4)
                return _composite(color_o, rays.t_values, False).color

            if mesh is None:
                run_chunk = render_chunk
            else:
                # one whole (optionally Pallas) render per device, rays
                # sharded over the data axis — GSPMD cannot split a
                # pallas_call, shard_map places one per chip
                # check_vma=False: pallas_call outputs carry no
                # varying-mesh-axes annotation (same as the shard_map
                # training step, parallel/data_parallel.py)
                run_chunk = jax.shard_map(
                    render_chunk, mesh=mesh,
                    in_specs=(P(), P(), P(), P("data")),
                    out_specs=P("data"), check_vma=False)

            def finish(colors, mask):
                colors = jnp.where(mask[:, None], colors, 0.0)
                image = jnp.clip(colors, 0.0, 1.0)
                image = image.reshape(height, width, 3)
                return (image * 255.0).astype(jnp.uint8)

            @jax.jit
            def frame_fn(model_arg, camera, geometry):
                offsets = jnp.arange(total, dtype=jnp.int32) % rays_per_cam
                off = offsets.reshape(num_chunks, chunk_size)

                def body(carry, off_chunk):
                    return carry, run_chunk(geometry, model_arg,
                                            camera, off_chunk)

                _, colors = jax.lax.scan(body, 0, off)
                colors = colors.reshape(total, 3)[:rays_per_cam]
                _, _, _, _, valid = ray_geom(
                    make_sampler(geometry), camera,
                    offsets[:rays_per_cam])
                return finish(colors, valid)

            def compute_hit(traced, camera):
                """Probe phase of the culled paths: which of the
                (padded-to-``total``) frame rays touch occupied space.

                With ``probe_subsample`` s > 1 only every s-th pixel
                in each image axis is probed (s^2 fewer probes) and
                the coarse hit raster is 3x3 max-dilated before
                upsampling — a ray is culled only when ITS probe and
                every neighboring coarse probe miss. Occupancy cells
                (64^3 over the volume) are tens of pixels wide at
                flagship resolution while adjacent rays diverge by
                ~s pixels, so the dilated coarse test is a
                conservative superset of the per-ray test (round-3
                measurement: identical hit sets on the bench scene,
                probe phase ~4x cheaper at s=2)."""
                offsets = jnp.arange(total, dtype=jnp.int32) % rays_per_cam
                if probe_subsample > 1:
                    s = probe_subsample
                    coarse_h = -(-height // s)
                    coarse_w = -(-width // s)
                    cy = jnp.minimum(jnp.arange(coarse_h) * s,
                                     height - 1)
                    cx = jnp.minimum(jnp.arange(coarse_w) * s,
                                     width - 1)
                    coarse_off = (cy[:, None] * width
                                  + cx[None, :]).reshape(-1)
                    coarse_off = coarse_off.astype(jnp.int32)
                    cs, cd, cn, cf, cvalid = ray_geom(traced, camera,
                                                      coarse_off)
                    _, _, hit_c = traced._probe_cdf_geometry(
                        cs, cd, cn, cf)
                    grid = (hit_c & cvalid).reshape(coarse_h, coarse_w)
                    padded = jnp.pad(grid, 1)
                    rows = (padded[:-2, :] | padded[1:-1, :]
                            | padded[2:, :])
                    dilated = (rows[:, :-2] | rows[:, 1:-1]
                               | rows[:, 2:])
                    fine = jnp.repeat(jnp.repeat(dilated, s, axis=0),
                                      s, axis=1)[:height, :width]
                    hit_fine = fine.reshape(-1)
                    reps = -(-total // rays_per_cam)
                    hit = jnp.tile(hit_fine, reps)[:total]
                    _, _, _, _, valid = ray_geom(traced, camera,
                                                 offsets)
                else:
                    starts, dirs, near, far, valid = ray_geom(
                        traced, camera, offsets)
                    _, _, hit = traced._probe_cdf_geometry(
                        starts, dirs, near, far)
                return hit & valid

            def partition(mask):
                """Stable partition: mask-true rays keep their order
                up front. Returns (true_count, perm: slot -> ray)."""
                count = jnp.sum(mask.astype(jnp.int32))
                true_slot = jnp.cumsum(mask.astype(jnp.int32)) - 1
                false_slot = (count
                              + jnp.cumsum((~mask).astype(jnp.int32))
                              - 1)
                slot = jnp.where(mask, true_slot, false_slot)
                perm = jnp.zeros(total, jnp.int32).at[slot].set(
                    jnp.arange(total, dtype=jnp.int32))
                return count, perm

            @jax.jit
            def frame_fn_culled(model_arg, camera, geometry):
                """Empty-space culling: probe the rays once (cheap,
                see ``compute_hit``), partition hit-rays first, run
                the model only on chunks that contain hits. Rays whose
                probes saw no occupied cell integrate (conservatively
                dilated) empty space and render as background without
                a model query."""
                traced = make_sampler(geometry)
                hit = compute_hit(traced, camera)
                num_hit, perm = partition(hit)

                def body(carry, k):
                    sl = jax.lax.dynamic_slice(perm, (k * chunk_size,),
                                               (chunk_size,))
                    # permuted slots -> pixel offsets: pure arithmetic
                    # (offsets[sl] would be another 16k-row gather)
                    off_chunk = sl % rays_per_cam
                    color = jax.lax.cond(
                        k * chunk_size < num_hit,
                        lambda _: run_chunk(geometry, model_arg,
                                            camera, off_chunk),
                        lambda _: jnp.zeros((chunk_size, 3)),
                        0)
                    return carry, color

                _, colors = jax.lax.scan(
                    body, 0, jnp.arange(num_chunks, dtype=jnp.int32))
                unperm = jnp.zeros((total, 3)).at[perm].set(
                    colors.reshape(total, 3))
                return finish(unperm[:rays_per_cam],
                              hit[:rays_per_cam])

            k1 = early_split if early_split > 0 \
                else sampler.num_samples // 2
            if early_term > 0.0 and not 1 <= k1 < sampler.num_samples:
                raise ValueError(
                    f"early_split {k1} must be in "
                    f"[1, {sampler.num_samples})")

            def render_chunk_prefix(geometry, model_arg, camera,
                                    off_chunk):
                """First ``k1`` samples of each ray: partial color and
                the outgoing transmittance (the early-term signal)."""
                rays, _ = sample_rays(make_sampler(geometry),
                                      camera, off_chunk)
                pos = rays.positions[:, :k1, :].reshape(-1, 3)
                views = rays.view_directions[:, :k1, :].reshape(-1, 3)
                logits = apply_fn(model_arg, pos, views)
                logits = logits.reshape(off_chunk.shape[0], k1, 4)
                color = jax.nn.sigmoid(logits[..., :3])
                opacity = jax.nn.softplus(logits[..., 3])
                w, trans_out = blend_weights_prefix(rays.t_values,
                                                    opacity)
                return (jnp.sum(w[..., None] * color, axis=-2),
                        trans_out)

            def render_chunk_suffix(geometry, model_arg, camera,
                                    off_chunk):
                """Remaining samples of surviving rays; the returned
                color is un-scaled (the frame combine multiplies by
                the stored prefix transmittance, so no per-ray gather
                is needed here). The t-values are recomputed from
                geometry — re-deriving the chunk's probe CDF is pure
                compute, while slicing stored (chunk, S) rows would be
                a ~50 ns/element dynamic gather (CLAUDE.md)."""
                rays, _ = sample_rays(make_sampler(geometry),
                                      camera, off_chunk)
                pos = rays.positions[:, k1:, :].reshape(-1, 3)
                views = rays.view_directions[:, k1:, :].reshape(-1, 3)
                logits = apply_fn(model_arg, pos, views)
                logits = logits.reshape(off_chunk.shape[0], -1, 4)
                color = jax.nn.sigmoid(logits[..., :3])
                opacity = jax.nn.softplus(logits[..., 3])
                w = blend_weights_suffix(rays.t_values, opacity)
                return jnp.sum(w[..., None] * color, axis=-2)

            if mesh is None:
                run_prefix = render_chunk_prefix
                run_suffix = render_chunk_suffix
            else:
                run_prefix = jax.shard_map(
                    render_chunk_prefix, mesh=mesh,
                    in_specs=(P(), P(), P(), P("data")),
                    out_specs=(P("data"), P("data")), check_vma=False)
                run_suffix = jax.shard_map(
                    render_chunk_suffix, mesh=mesh,
                    in_specs=(P(), P(), P(), P("data")),
                    out_specs=P("data"), check_vma=False)

            @jax.jit
            def frame_fn_culled_early(model_arg, camera, geometry):
                """Culled frame with early ray termination.

                Two passes over the hit rays. Pass 1 evaluates the
                model on each hit ray's first ``k1`` samples and
                composites the prefix, yielding the transmittance
                after them (``blend_weights_prefix``: bit-equal to
                the prefix of the unsplit integral). Rays whose
                transmittance fell below ``early_term`` are opaque —
                every remaining sample's contribution is bounded by
                the threshold — and are dropped. Pass 2 re-partitions
                the survivors and evaluates only their remaining
                samples, compositing with the suffix weights; the
                frame-level combine ``C1 + T1 * C2`` needs no per-ray
                gathers. Measured potential on the trained 800px
                flagship (tools/early_term_stats.py): 62-69% of hit
                rays saturate below 1e-3 by half the sample budget,
                i.e. ~31% of hit-ray model FLOPs skippable at
                eps=1e-3."""
                traced = make_sampler(geometry)
                hit = compute_hit(traced, camera)
                num_hit, perm = partition(hit)

                def body1(carry, k):
                    sl = jax.lax.dynamic_slice(
                        perm, (k * chunk_size,), (chunk_size,))
                    off_chunk = sl % rays_per_cam
                    out = jax.lax.cond(
                        k * chunk_size < num_hit,
                        lambda _: run_prefix(geometry, model_arg,
                                             camera, off_chunk),
                        lambda _: (jnp.zeros((chunk_size, 3)),
                                   jnp.zeros(chunk_size)),
                        0)
                    return carry, out

                _, (c1, t1) = jax.lax.scan(
                    body1, 0, jnp.arange(num_chunks, dtype=jnp.int32))
                colors1 = jnp.zeros((total, 3)).at[perm].set(
                    c1.reshape(total, 3))
                trans1 = jnp.zeros(total).at[perm].set(
                    t1.reshape(total))

                surviving = hit & (trans1 > early_term)
                num_surv, perm2 = partition(surviving)

                def body2(carry, k):
                    sl = jax.lax.dynamic_slice(
                        perm2, (k * chunk_size,), (chunk_size,))
                    off_chunk = sl % rays_per_cam
                    out = jax.lax.cond(
                        k * chunk_size < num_surv,
                        lambda _: run_suffix(geometry, model_arg,
                                             camera, off_chunk),
                        lambda _: jnp.zeros((chunk_size, 3)),
                        0)
                    return carry, out

                _, c2 = jax.lax.scan(
                    body2, 0, jnp.arange(num_chunks, dtype=jnp.int32))
                colors2 = jnp.zeros((total, 3)).at[perm2].set(
                    c2.reshape(total, 3))
                combined = colors1 + trans1[:, None] * colors2
                return finish(combined[:rays_per_cam],
                              hit[:rays_per_cam])

            if cull and early_term > 0.0:
                frame_fn = frame_fn_culled_early
            elif cull:
                frame_fn = frame_fn_culled

            self._render_fns[key] = (frame_fn, array_names)
        frame_fn, array_names = self._render_fns[key]
        # fresh snapshot each call: a cached `arrays` dict would pin
        # the occupancy grid/probe tables from build time, silently
        # ignoring sampler.set_occupancy_grid refreshes (the names are
        # fixed at trace time so the pytree structure stays stable —
        # zero recompiles for same-shape swaps)
        arrays = {name: getattr(sampler, name) for name in array_names}
        return frame_fn, arrays

    @staticmethod
    def _safe_probe_subsample(sampler, stride: int) -> int:
        """Clamps the cull-probe stride to 1 when occupancy cells are
        too small on screen for the coarse raster to stay
        conservative.

        The stride-s raster culls a ray only when its probe AND every
        3x3-dilated coarse neighbor miss — a superset of the exact
        per-ray test only while an occupied cell spans multiple
        coarse probes (cells are tens of pixels wide at flagship
        scale, where stride 2 measured bit-equal). At low resolution
        or fine grids a hit cell can fall between coarse probes and a
        fine ray through it would be wrongly culled; require a
        conservative >= 3*s pixel cell span (estimated from the rig's
        calibration) before subsampling."""
        if stride <= 1 or not hasattr(sampler, "_grid_resolution"):
            return stride
        cell = 2.0 * sampler._grid_scale / sampler._grid_resolution
        focal = min(float(c.intrinsics[0, 0])
                    for c in sampler.cameras)
        distance = max(float(np.linalg.norm(c.position[0]))
                       for c in sampler.cameras)
        span_px = focal * cell / max(distance, 1e-6)
        return stride if span_px >= 3.0 * stride else 1

    def render_frame(self, params, sampler: RaySampler, camera: int,
                     chunk_size: int = 16384,
                     color_space: str = "RGB",
                     cull_empty: bool = True,
                     mesh=None,
                     probe_subsample: int = 2,
                     early_term: float = 0.0,
                     early_split: int = 0) -> np.ndarray:
        """Renders a full camera frame in ONE device dispatch.

        ``render_image`` (the parity path, ray_caster.py:140-159)
        issues one device call per ray chunk plus a host scatter;
        through a high-latency runtime the per-dispatch overhead
        dominates the frame time, and its valid-ray-count shapes
        recompile per camera. Here sampling, the (optionally fused)
        model query, compositing and the uint8 conversion for every
        chunk run inside a single jitted ``lax.scan`` with
        camera-independent shapes — one compile serves a whole orbit,
        and exactly one (H, W, 3) uint8 buffer crosses back to host.
        Invalid rays render black via the sampler's validity mask
        (ray_sampler.py:177-200 semantics).

        With ``cull_empty`` (default) and a sampler exposing
        ``probe_cdf`` (OccupancyGridSampler), rays whose occupancy
        probes all land in empty space are partitioned out and never
        reach the model — chunks past the hit count skip the MLP via
        ``lax.cond``. They render as background (black), which for a
        trained field matches the un-culled render up to the field's
        residual opacity in (dilated) empty space.

        With ``mesh`` (a 1-D "data" mesh) each chunk is rendered
        across all chips via ``shard_map`` — one whole (optionally
        Pallas) render per device per chunk, rays sharded over ICI.
        """
        image = np.asarray(self.render_frame_async(
            params, sampler, camera, chunk_size, cull_empty, mesh,
            probe_subsample, early_term, early_split))
        if color_space == "YCrCb":
            import cv2
            image = cv2.cvtColor(image, cv2.COLOR_YCrCb2RGB)
        return image

    def render_frame_async(self, params, sampler: RaySampler,
                           camera: int, chunk_size: int = 16384,
                           cull_empty: bool = True,
                           mesh=None,
                           probe_subsample: int = 2,
                           early_term: float = 0.0,
                           early_split: int = 0) -> jnp.ndarray:
        """Dispatches one frame and returns the DEVICE buffer without
        blocking — callers rendering sequences overlap frame f+1's
        compute with frame f's host transfer by dispatching first and
        converting previous results afterwards (see cli/orbit_video).

        ``probe_subsample``: cull-probe pixel stride (see
        ``_frame_fn``; 1 = probe every ray, 2 = default coarse raster
        with conservative 3x3 dilation).

        ``early_term``: transmittance threshold for early ray
        termination (0 = off; needs culling). Rays opaque after
        ``early_split`` samples (default S//2) skip the model on
        their remaining samples; each skipped sample's color
        contribution is bounded by the threshold (1e-3 ~ 0.26 of a
        uint8 LSB)."""
        if mesh is not None:
            # per-device chunk rows must tile evenly
            chunk_size = -(-chunk_size // mesh.size) * mesh.size
        cull = cull_empty and hasattr(sampler, "probe_cdf")
        if cull:
            probe_subsample = self._safe_probe_subsample(
                sampler, probe_subsample)
        frame_fn, geometry = self._frame_fn(sampler, chunk_size, cull,
                                            mesh, probe_subsample,
                                            early_term=early_term,
                                            early_split=early_split)
        model_arg = (self._get_fused_weights(params) if self.fused
                     else params)
        camera = jnp.asarray(camera % sampler.num_cameras, jnp.int32)
        return frame_fn(model_arg, camera, geometry)

    def render_frame_pose(self, params, sampler: RaySampler, camera,
                          chunk_size: int = 16384,
                          color_space: str = "RGB",
                          cull_empty: bool = True,
                          mesh=None,
                          probe_subsample: int = 2,
                          early_term: float = 0.0,
                          early_split: int = 0) -> np.ndarray:
        """:meth:`render_frame` for an ARBITRARY camera pose.

        ``camera`` is a :class:`CameraInfo` (any extrinsics/intrinsics
        at the sampler's resolution) or a precomputed ``(ray_m,
        position)`` calibration pair (``RaySampler.pose_calibration``).
        The calibration enters the compiled frame function as a traced
        argument, so the first call compiles ONE executable that then
        serves every subsequent pose with zero recompiles — the
        serving free-camera path (the rig-index path embeds only the
        rig's calibration tables and cannot leave the rig). The pose
        path with a rig camera's own calibration is bit-identical to
        the indexed path (tests/test_pose_render.py)."""
        image = np.asarray(self.render_frame_pose_async(
            params, sampler, camera, chunk_size, cull_empty, mesh,
            probe_subsample, early_term, early_split))
        if color_space == "YCrCb":
            import cv2
            image = cv2.cvtColor(image, cv2.COLOR_YCrCb2RGB)
        return image

    def render_frame_pose_async(self, params, sampler: RaySampler,
                                camera, chunk_size: int = 16384,
                                cull_empty: bool = True,
                                mesh=None,
                                probe_subsample: int = 2,
                                early_term: float = 0.0,
                                early_split: int = 0) -> jnp.ndarray:
        """:meth:`render_frame_async` for an arbitrary camera pose
        (see :meth:`render_frame_pose`)."""
        if not hasattr(camera, "extrinsics"):  # (ray_m, position) pair
            calibration = tuple(camera)
        else:
            resolution = tuple(camera.resolution)
            expected = (sampler.image_width, sampler.image_height)
            if resolution != expected:
                raise ValueError(
                    f"pose resolution {resolution} != sampler "
                    f"resolution {expected}")
            calibration = RaySampler.pose_calibration(camera)
        if mesh is not None:
            chunk_size = -(-chunk_size // mesh.size) * mesh.size
        cull = cull_empty and hasattr(sampler, "probe_cdf")
        if cull:
            probe_subsample = self._safe_probe_subsample(
                sampler, probe_subsample)
        frame_fn, geometry = self._frame_fn(sampler, chunk_size, cull,
                                            mesh, probe_subsample,
                                            pose=True,
                                            early_term=early_term,
                                            early_split=early_split)
        model_arg = (self._get_fused_weights(params) if self.fused
                     else params)
        return frame_fn(model_arg, calibration, geometry)

    def render_activations(self, params, sampler: RaySampler, index: int,
                           batch_size: int,
                           color_space: str = "RGB") -> np.ndarray:
        """Renders an 8x8 grid of output-layer basis renders
        (ray_caster.py:161-218).

        Each cell re-renders the camera using a single hidden unit's
        contribution (activation * palette + bias) as the model
        output. Requires a model supporting ``return_hidden``.
        """
        camera = index % sampler.num_cameras
        samples = sampler.rays_for_camera(camera)
        out_layer = params["layers"][-1]
        palette = out_layer["weight"]  # (hidden, 4)
        bias = out_layer["bias"]

        # cached jitted fn with params as ARGUMENTS: a fresh @jax.jit
        # closure per call would pay a full (remote) compile every
        # visualizer invocation (CLAUDE.md jit-closure hazard)
        key = ("activations",)
        if key not in self._render_fns:
            @jax.jit
            def unit_render(params, palette, bias, positions, t_values):
                _, hidden = self.model.apply(params,
                                             positions.reshape(-1, 3),
                                             return_hidden=True)
                # (units, rays*samples, 4): unit u contributes
                # hidden[:, u] (outer) palette[u, :] + bias
                per_unit = (hidden.T[:, :, None] * palette[:, None, :]
                            + bias)
                num_rays = t_values.shape[0]
                per_unit = per_unit.reshape(palette.shape[0], num_rays,
                                            -1, 4)
                color = jax.nn.sigmoid(per_unit[..., :3])
                opacity = jax.nn.softplus(per_unit[..., 3])
                weights = jax.vmap(calculate_blend_weights,
                                   in_axes=(None, 0))(t_values, opacity)
                return jnp.sum(weights[..., None] * color, axis=-2)

            self._render_fns[key] = unit_render
        unit_render = self._render_fns[key]

        unit_colors = []
        num_rays = samples.positions.shape[0]
        for start in range(0, num_rays, batch_size):
            end = min(start + batch_size, num_rays)
            idx = np.arange(start, end)
            if end - start < batch_size:
                # pad the ragged tail to the fixed batch shape — a
                # per-camera tail shape would recompile per camera
                idx = np.pad(idx, (0, batch_size - (end - start)),
                             mode="edge")
            batch = samples.subset(idx)
            colors = np.asarray(unit_render(params, palette, bias,
                                            batch.positions,
                                            batch.t_values))
            unit_colors.append(colors[:, :end - start])
        unit_colors = np.concatenate(unit_colors, axis=1)

        num_grid = 8
        cell_h = sampler.image_height
        cell_w = sampler.image_width
        act_pixels = np.zeros((cell_h * num_grid, cell_w * num_grid, 3),
                              np.uint8)
        for i in range(num_grid):
            for j in range(num_grid):
                unit = i * num_grid + j
                pixels = sampler.to_image(camera, unit_colors[unit],
                                          color_space)
                act_pixels[i * cell_h:(i + 1) * cell_h,
                           j * cell_w:(j + 1) * cell_w] = pixels
        return act_pixels

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def to_scenepic(self, params, dataset: RayDataset, num_cameras=10,
                    resolution=50, num_samples=64, empty_threshold=0.1):
        """Model-state inspection scene (optional scenepic dep,
        ray_caster.py:379-488 parity)."""
        from ..scenepic_io import model_to_scenepic
        return model_to_scenepic(self, params, dataset, num_cameras,
                                 resolution, num_samples,
                                 empty_threshold)

    def _train_forward(self, params, rays: RaySamples) -> RenderResult:
        """Differentiable forward for training: the Pallas fused
        custom-VJP kernel when enabled (NeRF; composes with DP via
        shard_map — one whole kernel per device), otherwise the XLA
        autodiff path."""
        if not self.fused_train:
            if self.remat:
                return jax.checkpoint(
                    lambda p: self.render(p, rays, include_depth=False)
                )(params)
            return self.render(params, rays, include_depth=False)

        if self.fused_layout == "fm":
            from ..ops.fused_nerf_train_fm import (
                fused_nerf_train_apply_fm as train_apply,
                model_statics_fm as make_statics,
                pack_fused_nerf_fm as pack,
            )
        else:
            from ..ops.fused_nerf_train import (
                fused_nerf_train_apply as train_apply,
                model_statics as make_statics,
                pack_fused_nerf as pack,
            )

        dtype = (self.compute_dtype if self.compute_dtype is not None
                 else jnp.float32)
        statics = make_statics(self.model, dtype)
        tile = 512
        on_tpu = _on_tpu()

        num_rays, num_samples = rays.t_values.shape
        positions = rays.positions.reshape(-1, 3)
        views = rays.view_directions.reshape(-1, 3)
        num = positions.shape[0]
        padded = (num + tile - 1) // tile * tile
        if padded != num:
            positions = jnp.pad(positions, ((0, padded - num), (0, 0)))
            views = jnp.pad(views, ((0, padded - num), (0, 0)))

        packed = pack(self.model, params, dtype)
        logits = train_apply(statics, packed, positions,
                             views, tile, not on_tpu)
        logits = logits[:num].reshape(num_rays, num_samples, 4)
        return _composite(logits, rays.t_values, False)

    @staticmethod
    def _device_arrays(obj) -> dict:
        """The object's device-resident arrays, as a dict."""
        return {name: value for name, value in vars(obj).items()
                if isinstance(value, jnp.ndarray)}

    def _train_data(self, dataset: RayDataset, sampler=None) -> dict:
        """Device arrays of a dataset + its sampler, as a jit-argument
        pytree.

        Per-ray tables (starts/directions/colors/CDFs/...) closed over
        by a jitted step are embedded as CONSTANTS in the compile
        payload; at 800px scale that is hundreds of MB and the remote
        TPU runtime rejects the compile (HTTP 413 — see CLAUDE.md).
        Passing them as arguments keeps the payload model-sized. Same
        pattern as :meth:`_frame_fn`'s geometry dict.

        ``sampler`` pins a specific sampler; default is the dataset's
        CURRENT one (see :meth:`_bind_data` for why pinning matters).
        """
        if sampler is None:
            sampler = dataset.sampler
        if hasattr(sampler, "ensure_ray_tables"):
            # index-based sampling gathers from the per-ray tables;
            # materialize them before collecting (they're lazy)
            sampler.ensure_ray_tables()
        return {"sampler": self._device_arrays(sampler),
                "dataset": self._device_arrays(dataset)}

    @staticmethod
    def _bind_data(dataset: RayDataset, data: dict, sampler=None):
        """Shallow copies of (sampler, dataset) with their device
        arrays replaced by the traced ``data`` pytree leaves.

        ``sampler`` pins which sampler the trace binds. This runs at
        TRACE time (first call of the jitted step), which can be long
        after the step was BUILT — and ``fit`` swaps
        ``dataset.sampler`` for occupancy-guided training, so a step
        that must keep its build-time sampler (the ``occupancy_mix``
        full-sampling anchor) has to pass it explicitly or the trace
        would silently capture the swapped-in guided sampler (with
        its tables frozen as compile constants)."""
        import copy
        sampler = copy.copy(dataset.sampler if sampler is None
                            else sampler)
        for name, value in data["sampler"].items():
            object.__setattr__(sampler, name, value)
        bound = copy.copy(dataset)
        for name, value in data["dataset"].items():
            object.__setattr__(bound, name, value)
        object.__setattr__(bound, "sampler", sampler)
        return sampler, bound

    def _make_train_step(self, dataset: RayDataset, batch_size: int,
                         learning_rate: float, decay_rate: float,
                         decay_steps: int, weight_decay: float,
                         mesh=None, steps_per_call: int = 1):
        """Builds the jitted training step.

        With ``steps_per_call > 1`` the returned function runs that
        many optimization steps inside ONE compiled call via
        ``lax.scan`` — batch offsets advance (wrapping within the
        permutation) and the step counter/LR schedule advance per
        inner step. This amortizes per-dispatch runtime overhead,
        which dominates on remote/tunneled TPU runtimes.
        """
        # pin the CURRENT sampler: the step must keep sampling the way
        # it was built even if fit later swaps dataset.sampler (the
        # occupancy_mix anchor step is built against the base uniform
        # sampler moments before the guided sampler is installed)
        sampler = dataset.sampler
        stratified = sampler.stratified

        def local_loss_and_grads(params, idx, step, rng, data, forward):
            sampler_t, dataset_t = self._bind_data(dataset, data,
                                                   sampler=sampler)
            step_rng = jax.random.fold_in(rng, step) if stratified else None
            rays = sampler_t.sample(idx, step, step_rng)

            def loss_fn(p):
                return dataset_t.loss(idx, forward(p, rays))

            return jax.value_and_grad(loss_fn)(params)

        if mesh is not None and self.fused_train:
            # GSPMD cannot partition a pallas_call, but shard_map
            # places one whole fused kernel per device: each chip runs
            # the custom-VJP recompute-backward kernel on its ray
            # shard, then the loss/grads pmean over ICI. Stratified
            # jitter is keyed per global ray index (per_ray_uniform),
            # so this draws the same samples as the GSPMD layout.
            from functools import partial

            @partial(jax.shard_map, mesh=mesh,
                     in_specs=(P(), P("data"), P(), P(), P()),
                     out_specs=(P(), P()), check_vma=False)
            def loss_and_grads(params, idx, step, rng, data):
                loss, grads = local_loss_and_grads(
                    params, idx, step, rng, data, self._train_forward)
                loss = jax.lax.pmean(loss, "data")
                grads = jax.tree.map(
                    lambda g: jax.lax.pmean(g, "data"), grads)
                return loss, grads
        elif mesh is not None:
            # XLA autodiff path: a sharding constraint on the ray
            # index batch is enough — GSPMD shards the whole step and
            # inserts the gradient all-reduce
            def loss_and_grads(params, idx, step, rng, data):
                idx = jax.lax.with_sharding_constraint(
                    idx, NamedSharding(mesh, P("data")))
                return local_loss_and_grads(
                    params, idx, step, rng, data,
                    lambda p, r: self.render(p, r, False))
        else:
            def loss_and_grads(params, idx, step, rng, data):
                return local_loss_and_grads(params, idx, step, rng,
                                            data, self._train_forward)

        def one_step(params, opt_state, perm, offset, step, rng, data):
            idx = jax.lax.dynamic_slice(perm, (offset,), (batch_size,))
            loss, grads = loss_and_grads(params, idx, step, rng, data)
            lr = exponential_lr(learning_rate, step, decay_rate,
                                decay_steps)
            params, opt_state = adam_update(
                grads, opt_state, params, lr, weight_decay=weight_decay,
                clip_value=0.1, clip_norm=0.1)
            return params, opt_state, loss

        def multi_step(params, opt_state, perm, offset, step, rng, data):
            modulo = max(perm.shape[0] - batch_size + 1, 1)

            def body(carry, k):
                params, opt_state = carry
                k_offset = (offset + k * batch_size) % modulo
                params, opt_state, loss = one_step(
                    params, opt_state, perm, k_offset, step + k, rng,
                    data)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state),
                jnp.arange(steps_per_call, dtype=jnp.int32))
            return params, opt_state, losses[-1]

        jitted = jax.jit(one_step if steps_per_call <= 1 else multi_step,
                         donate_argnums=(0, 1))
        state = {}

        def refresh():
            """Re-collects the dataset/sampler device arrays. Because
            they are jit ARGUMENTS, swapping same-shape arrays (e.g. a
            refreshed occupancy grid) costs NO recompile."""
            data = self._train_data(dataset, sampler=sampler)
            if mesh is not None:
                # the tables were previously jit constants
                # (= replicated); as arguments they must be
                # replicated explicitly (multi-host aware)
                from ..parallel.mesh import put_replicated
                data = put_replicated(data, mesh)
            state["data"] = data

        refresh()

        def train_step(params, opt_state, perm, offset, step, rng):
            return jitted(params, opt_state, perm, offset, step, rng,
                          state["data"])

        train_step.refresh = refresh
        return train_step

    def _make_loss_fn(self, dataset: RayDataset, batch_size: int):
        """One jitted dispatch for the WHOLE validation pass: the chunk
        loop is a lax.scan over ``(num_batches, batch_size)`` index
        rows, so a 100-chunk validation costs one device call instead
        of 100 ~3-6 ms tunnel round-trips (VERDICT r1 item 5). The
        per-ray tables ride as jit arguments (see _train_data)."""

        @jax.jit
        def jitted(params, batches, step, data):
            sampler_t, dataset_t = self._bind_data(dataset, data)

            def body(_, idx):
                rays = sampler_t.sample(idx, step, None)
                render = self._train_forward(params, rays)
                return None, dataset_t.loss(idx, render)

            _, losses = jax.lax.scan(body, None, batches)
            return jnp.mean(losses)

        data = self._train_data(dataset)

        def loss_fn(params, batches, step):
            return jitted(params, batches, step, data)

        return loss_fn

    def _validate(self, params, dataset: RayDataset, batch_size: int,
                  step: int, loss_fn) -> float:
        """PSNR over <=102,400 evenly strided valid rays
        (ray_caster.py:220-246)."""
        num_rays = len(dataset)
        num_validate = min(num_rays, 1024 * 100)
        if num_validate < num_rays:
            val_index = np.linspace(0, num_rays, num_validate,
                                    endpoint=False).astype(np.int64)
        else:
            val_index = np.arange(num_rays)
        if dataset.mode != Mode.Full:
            val_index = dataset._mode_index(dataset.mode)[val_index]
        val_index = dataset.to_valid(val_index)

        num_batches = len(val_index) // batch_size
        if num_batches == 0:
            return float("nan")
        # whole pass scanned inside one jit: ONE dispatch + ONE host
        # sync regardless of the number of chunks
        batches = jnp.asarray(
            val_index[:num_batches * batch_size]).reshape(
                num_batches, batch_size)
        step = jnp.asarray(step, jnp.int32)
        mean_loss = float(loss_fn(params, batches, step))
        return float(-10.0 * np.log10(max(mean_loss, 1e-10)))

    def fit(self, params, train_dataset: RayDataset,
            val_dataset: RayDataset, batch_size: int,
            learning_rate: float, num_steps: int, crop_steps: int,
            report_interval: int, decay_rate: float, decay_steps: int,
            weight_decay: float = 0.0, visualizers=(),
            mesh=None, seed: int = 0, metric_logger=None,
            checkpoint_dir: Optional[str] = None,
            checkpoint_interval: Optional[int] = None,
            resume: bool = False,
            steps_per_call: int = 1,
            occupancy_interval: Optional[int] = None,
            occupancy_samples: int = 48,
            occupancy_start: Optional[int] = None,
            occupancy_end: Optional[int] = None,
            occupancy_empty_weight: float = 0.1,
            occupancy_mix: int = 0
            ) -> Tuple[dict, List[LogEntry]]:
        """Fits the model to the dataset (ray_caster.py:248-377 parity).

        Args:
            params: initial model parameters.
            train_dataset / val_dataset: ray datasets.
            batch_size: rays per training step (global across mesh).
            learning_rate / decay_rate / decay_steps: per-step
                exponential LR schedule.
            num_steps: total optimization steps.
            crop_steps: steps of center-crop curriculum at the start.
            report_interval: steps between train/val PSNR reports.
            weight_decay: Adam L2 weight decay.
            visualizers: objects with
                ``visualize(step, render_fn, act_fn)``.
            mesh: optional jax.sharding.Mesh with a "data" axis for
                ray-parallel training across chips.
            seed: RNG seed for shuffling/stratified jitter.
            metric_logger: optional callable(name, value) — the
                AML-run-log equivalent (ray_caster.py:354-357).
            checkpoint_dir / checkpoint_interval: when set, a
                resumable TrainState checkpoint is written every
                ``checkpoint_interval`` steps.
            resume: restore the newest checkpoint in
                ``checkpoint_dir`` before training (exact optimizer
                state; the epoch shuffle restarts).
            steps_per_call: optimization steps per compiled call
                (lax.scan inside one jit). Values > 1 amortize
                per-dispatch runtime overhead; reports, visualizers
                and checkpoints then land on chunk boundaries.
            occupancy_interval: when set, enables occupancy-guided
                TRAINING (the NerfAcc recipe on this framework's CDF
                machinery): from ``occupancy_start`` on, the train
                sampler is swapped for a density-grid
                OccupancyGridSampler drawing ``occupancy_samples``
                samples/ray (vs the dataset's full count — the
                speedup), and the grid is re-thresholded from the
                LIVE model every ``occupancy_interval`` steps.
                Because the tables ride as jit arguments
                (_train_data), each refresh costs one 262k-point
                model sweep and ZERO recompiles. Validation always
                uses the dataset's original full-sample uniform
                protocol. Incompatible with focus/opacity samplers.
            occupancy_samples: samples/ray for the guided phase.
            occupancy_start: first guided step (default: after the
                crop curriculum, at least 1000 — early density fields
                are noise).
            occupancy_end: when set, restore the dataset's full
                uniform sampling from this step on (a fine-tune tail
                that recovers the guided phase's small val-PSNR cost
                while keeping most of the speedup).
            occupancy_empty_weight: relative CDF mass of probes the
                grid marks empty. During training the grid comes from
                the LIVE, still-changing model, so cells it wrongly
                thresholds empty must keep residual samples or the
                field can never recover content there — see the
                round-3 empty-weight A/B in docs/RESULTS.md
                (the octree-mode ctor default is 1e-2; training
                defaults to the from_model guidance of 0.1).
            occupancy_mix: full-sampling steps appended after each
                occupancy chunk (``steps_per_call`` guided steps,
                then this many steps at the dataset's original
                uniform sampling through a second compiled step).
                Anchors the field to the validation quadrature
                throughout the guided phase instead of only in a
                fine-tune tail — the round-3 A/B measured the
                guided-phase quality gap to be a steady-state effect
                of the concentrated 48-sample operator, not an
                early-training one (docs/RESULTS.md).

        Returns:
            (params, log) — final parameters and LogEntry list.
        """
        from ..utils.checkpoint import (
            AsyncCheckpointer,
            latest_checkpoint,
            load_train_state,
        )

        rng = jax.random.PRNGKey(seed)
        trainval_dataset = train_dataset.sample_cameras(
            val_dataset.num_cameras, val_dataset.num_samples, False)

        opt_state = adam_init(params)
        start_step = 0
        if resume and checkpoint_dir:
            ckpt = latest_checkpoint(checkpoint_dir)
            if ckpt:
                state = load_train_state(ckpt)
                params, opt_state = state.params, state.opt_state
                start_step = state.step + 1
                print(f"Resumed from {ckpt} at step {start_step}")

        dataset_mode = train_dataset.mode
        if crop_steps and start_step < crop_steps:
            train_dataset.mode = Mode.Center
            val_dataset.mode = Mode.Center
            trainval_dataset.mode = Mode.Center
        else:
            val_dataset.mode = dataset_mode
            trainval_dataset.mode = dataset_mode
        if mesh is not None:
            replicated = NamedSharding(mesh, P())
            # copy first: device_put may alias compatible buffers and
            # the train step donates them — without the copy the
            # caller's params arrays would be deleted.
            params = jax.device_put(jax.tree.map(jnp.copy, params),
                                    replicated)
            opt_state = jax.device_put(opt_state, replicated)

        chunk = max(1, min(steps_per_call, report_interval))
        train_step = self._make_train_step(
            train_dataset, batch_size, learning_rate, decay_rate,
            decay_steps, weight_decay, mesh, steps_per_call=chunk)
        val_loss_fns = {}

        def validate(dataset, step):
            key = id(dataset)
            if key not in val_loss_fns:
                val_loss_fns[key] = self._make_loss_fn(dataset, batch_size)
            return self._validate(params, dataset, batch_size, step,
                                  val_loss_fns[key])

        def render_image_fn(samples: RaySamples, include_depth: bool):
            # visualizer eval renders are no-grad: use TPU-sized
            # chunks regardless of the training batch — at 800px a
            # 1024-ray chunking costs 625 dispatch round-trips per
            # image through a remote runtime
            return self.batched_render(params, samples,
                                       max(batch_size, 16384),
                                       include_depth)

        def render_act_fn(sampler: RaySampler, camera: int):
            return self.render_activations(params, sampler, camera,
                                           batch_size,
                                           train_dataset.color_space)

        checkpointer = None
        if checkpoint_dir and checkpoint_interval:
            checkpointer = AsyncCheckpointer(checkpoint_dir)

        base_sampler = train_dataset.sampler
        occupancy_active = False
        occupancy_done = False
        mix_step = None
        if occupancy_interval:
            if base_sampler.focus_sampling:
                raise ValueError("occupancy-guided training is "
                                 "incompatible with a focus/opacity "
                                 "sampler")
            if occupancy_start is None:
                occupancy_start = max(crop_steps, 1000)

        def update_occupancy():
            """Swaps in (first call, one recompile) or refreshes
            (zero recompiles) the density-grid training sampler."""
            nonlocal train_step, occupancy_active, mix_step
            from .occupancy_sampler import (
                OccupancyGridSampler,
                density_grid_from_model,
            )
            scale = float(base_sampler.bounds_max[0])
            grid = density_grid_from_model(self.model, params,
                                           scale=scale)
            if not occupancy_active:
                print("Enabling occupancy-guided sampling "
                      f"({occupancy_samples} samples/ray"
                      + (f", {occupancy_mix} full steps/chunk"
                         if occupancy_mix else "") + ")...")
                if occupancy_mix and mix_step is None:
                    # full-sampling anchor step, built while the BASE
                    # sampler is still installed on the dataset
                    mix_step = self._make_train_step(
                        train_dataset, batch_size, learning_rate,
                        decay_rate, decay_steps, weight_decay, mesh,
                        steps_per_call=occupancy_mix)
                occ = OccupancyGridSampler(
                    None, base_sampler.cameras, occupancy_samples,
                    stratified=base_sampler.stratified,
                    bounds=base_sampler.bounds, occupancy_grid=grid,
                    grid_scale=scale,
                    empty_weight=occupancy_empty_weight)
                # same cameras + bounds => identical per-ray tables;
                # share the base sampler's instead of rebuilding
                # (~0.5 GB + upload at 800px scale)
                base_sampler.ensure_ray_tables()
                for name in RaySampler._RAY_TABLES:
                    object.__setattr__(occ, name,
                                       getattr(base_sampler, name))
                occ._ray_tables_ready = True
                train_dataset.sampler = occ
                train_step = self._make_train_step(
                    train_dataset, batch_size, learning_rate,
                    decay_rate, decay_steps, weight_decay, mesh,
                    steps_per_call=chunk)
                occupancy_active = True
            else:
                train_dataset.sampler.set_occupancy_grid(grid)
                train_step.refresh()

        log: List[LogEntry] = []
        step = start_step
        epoch_rng = jax.random.fold_in(rng, start_step)
        start_time = time.time()

        try:
            while step <= num_steps:
                pool = jnp.asarray(train_dataset.index_pool())
                epoch_rng, perm_key, strat_key = jax.random.split(epoch_rng, 3)
                perm = jax.random.permutation(perm_key, pool)
                num_batches = len(pool) // batch_size

                restart_epoch = False
                for batch_num in range(0, max(num_batches, chunk), chunk):
                    if step > num_steps or restart_epoch:
                        break
                    params, opt_state, loss = train_step(
                        params, opt_state, perm,
                        jnp.asarray(batch_num * batch_size, jnp.int32),
                        jnp.asarray(step, jnp.int32), strat_key)
                    # this call executed steps [first, last]; everything
                    # below (reports, checkpoints, visualizers) anchors on
                    # `last` and `step` is only ever last + 1
                    first, last = step, step + chunk - 1
                    step = last + 1
                    if occupancy_active and mix_step is not None:
                        # quadrature anchor: a few full-sampling steps
                        # through the BASE sampler after each guided
                        # chunk (rays continue within the epoch
                        # permutation, wrapping like the chunk scan)
                        modulo = max(len(pool) - batch_size + 1, 1)
                        mix_offset = ((batch_num + chunk)
                                      * batch_size) % modulo
                        params, opt_state, loss = mix_step(
                            params, opt_state, perm,
                            jnp.asarray(mix_offset, jnp.int32),
                            jnp.asarray(step, jnp.int32), strat_key)
                        last = step + occupancy_mix - 1
                        step = last + 1

                    # a report is due iff [first, last] covers a
                    # multiple of report_interval — the window is wider
                    # than `chunk` when occupancy_mix appends anchor
                    # steps, so a fixed-width `last % interval` test
                    # would silently skip reports; single-step runs
                    # also report the first few steps (parity with the
                    # reference's per-step prints)
                    interval_due = (last // report_interval
                                    > (first - 1) // report_interval)
                    report_due = interval_due or (chunk == 1
                                                  and last < 10)

                    if report_due:
                        train_psnr = validate(trainval_dataset, last)
                        val_psnr = validate(val_dataset, last)
                        current_time = time.time()
                        # denominator: steps executed THIS run — the
                        # absolute step would underestimate s/step by
                        # start_step/last after a checkpoint resume
                        steps_run = last - start_step
                        time_per_step = (
                            (current_time - start_time) / steps_run
                            if steps_run >= report_interval else 0)
                        print("{:07}".format(last),
                              "{:2f} s/step".format(time_per_step),
                              "psnr_train: {:2f}".format(train_psnr),
                              "val_psnr: {:2f}".format(val_psnr))
                        if metric_logger:
                            metric_logger("psnr_train", train_psnr)
                            metric_logger("psnr_val", val_psnr)
                            metric_logger("time_per_step", time_per_step)

                        if interval_due:
                            state = jax.tree.map(np.asarray, params)
                            log.append(LogEntry(last,
                                                current_time - start_time,
                                                state, train_psnr, val_psnr))

                        if (train_dataset.mode == Mode.Center
                                and last >= crop_steps):
                            print("Removing center crop...")
                            train_dataset.mode = dataset_mode
                            val_dataset.mode = dataset_mode
                            trainval_dataset.mode = dataset_mode
                            if dataset_mode == Mode.Dilate:
                                # the compiled step traced the loss under
                                # Center mode, but Dilate DISABLES the
                                # alpha term (image_dataset.py:287-296) —
                                # rebuild so post-crop semantics match the
                                # eager reference (other modes share the
                                # Center trace; no recompile needed)
                                train_step = self._make_train_step(
                                    train_dataset, batch_size,
                                    learning_rate, decay_rate, decay_steps,
                                    weight_decay, mesh,
                                    steps_per_call=chunk)
                                val_loss_fns.clear()
                            restart_epoch = True

                    # due iff [first, last] covers a multiple of
                    # checkpoint_interval — independent of the crop
                    # transition above, and labeled with the last step
                    # that actually executed (resume restarts at last + 1).
                    # Window-exact like the report test: the fixed-width
                    # `last % interval < chunk` form skipped checkpoints
                    # whenever occupancy_mix widened the step window.
                    if (checkpointer is not None and last > start_step
                            and last // checkpoint_interval
                            > (first - 1) // checkpoint_interval):
                        # device-side snapshot + background write: the
                        # step loop never blocks on the host fetch
                        checkpointer.save(self.model, params, opt_state,
                                          last, seed)

                    # fine-tune tail: restore the full uniform
                    # sampling for the final steps
                    if (occupancy_active and occupancy_end is not None
                            and last >= occupancy_end):
                        print("Restoring full sampling for the "
                              "fine-tune tail...")
                        train_dataset.sampler = base_sampler
                        train_step = self._make_train_step(
                            train_dataset, batch_size, learning_rate,
                            decay_rate, decay_steps, weight_decay,
                            mesh, steps_per_call=chunk)
                        occupancy_active = False
                        occupancy_done = True
                    # occupancy activation/refresh: due when [first, last]
                    # enters a new occupancy_interval window past the
                    # start (and immediately at activation)
                    elif (occupancy_interval and not occupancy_done
                            and last >= occupancy_start
                            and train_dataset.mode != Mode.Center
                            and (not occupancy_active
                                 or last // occupancy_interval
                                 > (first - 1) // occupancy_interval)):
                        update_occupancy()

                    if not restart_epoch:
                        for visualizer in visualizers:
                            visualizer.visualize(last, render_image_fn,
                                                 render_act_fn)

        finally:
            # cleanup runs on normal exit AND on interruption: the
            # caller's dataset gets its original sampler back and the
            # checkpoint writer thread is joined
            if checkpointer is not None:
                checkpointer.close()
            if occupancy_active:
                train_dataset.sampler = base_sampler
        return params, log
