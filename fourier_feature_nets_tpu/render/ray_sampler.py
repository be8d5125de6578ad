"""On-device ray sampling engine.

TPU re-design of the reference sampler
(/root/reference/fourier_feature_nets/ray_sampler.py). The reference
splits work between a CPU sampler (linspace/jitter/inverse-CDF per
batch, Python index sets) and a GPU model, shipping rays host->device
every step (ray_caster.py:98). Here the split disappears:

  * Ray origins/directions/near-far (and focus-sampling CDFs) are
    precomputed ONCE into device arrays at construction.
  * ``sample(idx, step, rng)`` is a pure, jit-safe function: gathers +
    linspace + stratified jitter + inverse-CDF + sort, all on device,
    so it fuses into the training step.
  * Invalid rays (missing the volume) are a precomputed boolean mask
    instead of a Python set; index pools are filtered once on host.
"""

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import CameraInfo, raycast_grid
from ..ops import (
    anneal_near_far,
    batch_linspace,
    bounds_min_max,
    determine_cdf,
    inverse_cdf_t_values,
    merge_sorted,
    per_ray_uniform,
    ray_aabb_near_far,
    uniform_t_values,
)

__all__ = ["RaySamples", "RaySampler"]


def _iid_focus_quantiles() -> bool:
    """Parity-ablation switch (read at trace time): draw the fine
    inverse-CDF quantiles iid-sorted like the reference instead of
    stratified. Only for head-to-head ablations; the stratified
    default converges faster at identical cost."""
    import os
    return bool(os.environ.get("FFN_TPU_IID_FOCUS_QUANTILES"))


class RaySamples(NamedTuple):
    """Point samples along rays, grouped (num_rays, num_samples).

    Parity: ray_sampler.py:15-56. ``rays`` holds the global ray index
    of each row (camera-major, row-major pixel order).
    """

    positions: jnp.ndarray
    view_directions: jnp.ndarray
    t_values: jnp.ndarray
    rays: jnp.ndarray

    def subset(self, index) -> "RaySamples":
        """Selects a subset of rays."""
        return RaySamples(*[None if t is None else t[index]
                            for t in self])

    def numpy(self) -> "RaySamples":
        """Converts all tensors to NumPy."""
        return RaySamples(*[None if t is None else np.asarray(t)
                            for t in self])

    def to(self, *args) -> "RaySamples":
        """API-compat no-op: JAX arrays are device-resident already
        (the reference moves tensors host->GPU per batch,
        ray_sampler.py:38-46)."""
        del args
        return self

    def pin_memory(self) -> "RaySamples":
        """API-compat no-op (no host staging buffers in JAX)."""
        return self


class RaySampler:
    """Samples points along camera rays cast into a bounded volume."""

    def __init__(self, bounds: np.ndarray, cameras: List[CameraInfo],
                 num_samples: int, stratified: bool = False,
                 opacity_model=None, opacity_params=None,
                 batch_size: int = 4096, anneal_start: float = 0.5,
                 num_anneal_steps: int = 0):
        """Constructor.

        Args:
            bounds: (4, 4) transform from the unit cube to the render
                volume.
            cameras: scene cameras (all same resolution).
            num_samples: samples per ray.
            stratified: use stratified (jittered) sampling.
            opacity_model/opacity_params: optional model + params used
                to precompute inverse-CDF focus sampling distributions
                (ray_sampler.py:59-67, 161-166).
            batch_size: rays per batch for the opacity sweep.
            anneal_start/num_anneal_steps: sample-space annealing
                schedule (ray_sampler.py:373-378).
        """
        self._ray_tables_ready = False
        self.bounds = np.asarray(bounds, np.float32)
        lo, hi = bounds_min_max(bounds)
        self.bounds_min, self.bounds_max = lo, hi
        self.image_width, self.image_height = cameras[0].resolution
        self.rays_per_camera = self.image_width * self.image_height
        self.num_cameras = len(cameras)
        self.num_rays = self.num_cameras * self.rays_per_camera
        self.num_samples = num_samples
        self.stratified = stratified
        self.anneal_start = anneal_start
        self.num_anneal_steps = num_anneal_steps
        self.cameras = cameras
        self.batch_size = batch_size
        self.opacity_model = opacity_model
        self.opacity_params = opacity_params
        self.focus_sampling = opacity_model is not None

        # calibration tables for GATHER-FREE per-camera ray generation
        # (camera_ray_geometry): direction of pixel (x, y) is linear in
        # the pixel coordinates, d = M @ [x, y, 1] with M = R @ K^-1
        # (cameras.py raycast/unproject algebra), so whole-frame paths
        # can COMPUTE ray geometry instead of gathering per-ray rows —
        # XLA lowers big dynamic gathers to ~85 ns/row scalar loops
        # (measured; see CLAUDE.md runtime limits).
        ray_m = np.stack([
            camera.extrinsics[:3, :3] @ np.linalg.inv(camera.intrinsics)
            for camera in cameras])
        self.cam_ray_m = jnp.asarray(ray_m.astype(np.float32))
        self.cam_positions = jnp.asarray(np.stack(
            [camera.position[0] for camera in cameras]).astype(np.float32))

        if self.focus_sampling:
            self.num_focus_samples = num_samples - num_samples // 2
            self.cdfs = self._precompute_cdfs()
        else:
            self.num_focus_samples = 0
            self.cdfs = None

    # ------------------------------------------------------------------
    # construction helpers
    # ------------------------------------------------------------------

    # Per-ray tables (starts/directions/near/far/valid) are built
    # LAZILY: whole-frame rendering computes ray geometry from the
    # calibration tables and never reads them, and for an orbit of
    # fresh cameras at 800px they are ~1 GB of host raycasting +
    # device upload (measured ~17 min of a 40-frame orbit's setup
    # through the remote runtime). Index-based paths (training,
    # probe_cdf(idx), to_valid) materialize them on first access.
    _RAY_TABLES = ("starts", "directions", "near", "far", "valid")

    def __getattr__(self, name):
        if (name in RaySampler._RAY_TABLES
                and self.__dict__.get("_ray_tables_ready") is False):
            self._build_ray_tables()
            return self.__dict__[name]
        raise AttributeError(
            f"{type(self).__name__!r} object has no attribute {name!r}")

    def ensure_ray_tables(self) -> None:
        """Materializes the per-ray tables (gather-based paths)."""
        if not self._ray_tables_ready:
            self._build_ray_tables()

    def _build_ray_tables(self) -> None:
        ray = raycast_grid(self.cameras)
        self.starts = jnp.asarray(ray.origin.astype(np.float32))
        self.directions = jnp.asarray(ray.direction.astype(np.float32))
        nf = ray_aabb_near_far(self.starts, self.directions,
                               jnp.asarray(self.bounds_min),
                               jnp.asarray(self.bounds_max))
        # sanitize invalid rays so downstream math stays finite
        self.near = jnp.where(nf.valid, nf.near, 1.0)
        self.far = jnp.where(nf.valid, nf.far, 2.0)
        self.valid = np.asarray(nf.valid)
        self._ray_tables_ready = True

    def _precompute_cdfs(self) -> jnp.ndarray:
        """Sweeps the opacity model over all rays to build focus CDFs.

        Parity: ray_sampler.py:148-166 + 234-269 — opacity is the
        softplus of the model's last output channel evaluated on a
        ``num_focus_samples``-point linspace grid per ray.
        """
        model = self.opacity_model
        params = self.opacity_params
        num_grid = self.num_focus_samples
        # batch_size mirrors the reference API (caps the opacity
        # model's batch, ray_sampler.py:131) but tiny CLI defaults
        # (1024-4096) would mean thousands of dispatches for big
        # datasets: sweep in TPU-sized chunks instead.
        sweep_batch = max(self.batch_size, 65536)

        @jax.jit
        def cdf_batch(starts, directions, near, far):
            t_values = batch_linspace(near, far, num_grid)
            positions = (starts[:, None, :]
                         + t_values[..., None] * directions[:, None, :])
            flat_pos = positions.reshape(-1, 3)
            if model.use_view:
                views = jnp.broadcast_to(directions[:, None, :],
                                         positions.shape).reshape(-1, 3)
                logits = model.apply(params, flat_pos, views)[:, -1]
            else:
                logits = model.apply(params, flat_pos)[:, -1]
            opacity = jax.nn.softplus(logits).reshape(-1, num_grid)
            return determine_cdf(t_values, opacity)

        cdfs = []
        for start in range(0, self.num_rays, sweep_batch):
            end = min(start + sweep_batch, self.num_rays)
            pad = sweep_batch - (end - start)
            sel = slice(start, end)

            def padded(x):
                return jnp.pad(x[sel], [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                               constant_values=1.0 if x.ndim == 1 else 0.0)

            batch = cdf_batch(padded(self.starts), padded(self.directions),
                              padded(self.near), padded(self.far))
            cdfs.append(np.asarray(batch)[:end - start])
        return jnp.asarray(np.concatenate(cdfs))

    # ------------------------------------------------------------------
    # sampling (jit-safe)
    # ------------------------------------------------------------------

    def sample(self, idx: jnp.ndarray, step=None,
               rng: Optional[jax.Array] = None) -> RaySamples:
        """Samples the requested rays. Pure and jit-safe.

        Args:
            idx: (R,) int32 global ray indices (should be valid rays).
            step: training step (traced scalar ok); None disables
                annealing (eval-time behavior, ray_sampler.py:373).
            rng: PRNG key for stratified sampling; required when the
                sampler was built with ``stratified=True`` and ignored
                otherwise.

        Returns:
            RaySamples with (R, num_samples) geometry.

        Parity: ray_sampler.py:359-403 — half the samples uniform
        (with optional stratified jitter), half inverse-CDF when focus
        sampling is active, combined sorted along the ray.

        TPU notes (deliberate departures, statistically equivalent):

          * Stratified jitter is keyed by GLOBAL ray index
            (``per_ray_uniform``), not batch position, so every
            data-parallel layout (GSPMD, shard_map) draws identical
            samples for the same (seed, step, ray).
          * Focus quantiles are stratified ((k + u) / n, sorted by
            construction) rather than iid-then-sorted; both halves
            are then monotone and combine via a sort-free two-sequence
            ``merge_sorted`` — per-ray ``jnp.sort`` lowers to a full
            bitonic network on TPU (see CLAUDE.md runtime limits).
        """
        idx = jnp.asarray(idx)
        return self._sample_geometry(
            self.starts[idx], self.directions[idx], self.near[idx],
            self.far[idx], idx, step, rng)

    def camera_ray_geometry(self, camera, offsets):
        """Ray geometry for pixel ``offsets`` of one camera, COMPUTED
        from calibration — no per-ray gathers (jit-safe, ``camera``
        may be a traced scalar).

        Returns:
            (starts, directions, near, far, valid) arrays of shape
            (R, 3) / (R,), numerically identical to indexing the
            precomputed per-ray tables.
        """
        m = jax.lax.dynamic_index_in_dim(self.cam_ray_m, camera, 0,
                                         keepdims=False)
        p = jax.lax.dynamic_index_in_dim(self.cam_positions, camera, 0,
                                         keepdims=False)
        return self.pose_ray_geometry(m, p, offsets)

    def pose_ray_geometry(self, ray_m, position, offsets):
        """Ray geometry for pixel ``offsets`` of an ARBITRARY camera
        pose given by its calibration ``(ray_m, position)`` — the
        direction matrix ``M = R @ K^-1`` and the world-space camera
        position (same algebra as the precomputed per-rig tables,
        cameras.py raycast/unproject). Both may be traced jit
        arguments, so one compiled frame executable serves any pose
        at the sampler's resolution (the serving free-camera path).

        Returns:
            (starts, directions, near, far, valid), as
            :meth:`camera_ray_geometry`.
        """
        x = (offsets % self.image_width).astype(jnp.float32)
        y = (offsets // self.image_width).astype(jnp.float32)
        d = (x[:, None] * ray_m[:, 0] + y[:, None] * ray_m[:, 1]
             + ray_m[:, 2])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        starts = jnp.broadcast_to(position, d.shape)
        nf = ray_aabb_near_far(starts, d,
                               jnp.asarray(self.bounds_min),
                               jnp.asarray(self.bounds_max))
        near = jnp.where(nf.valid, nf.near, 1.0)
        far = jnp.where(nf.valid, nf.far, 2.0)
        return starts, d, near, far, nf.valid

    @staticmethod
    def pose_calibration(camera) -> tuple:
        """``(ray_m, position)`` jit-argument calibration for one
        :class:`CameraInfo` (the input to :meth:`pose_ray_geometry`)."""
        m = (camera.extrinsics[:3, :3]
             @ np.linalg.inv(camera.intrinsics)).astype(np.float32)
        return jnp.asarray(m), jnp.asarray(
            camera.position[0].astype(np.float32))

    def sample_camera_rays(self, camera, offsets, step=None,
                           rng: Optional[jax.Array] = None):
        """Like :meth:`sample` for rays of ONE camera, with gather-free
        computed geometry (whole-frame render path).

        Returns:
            (RaySamples, valid) — valid marks rays hitting the volume.
        """
        starts, directions, near, far, valid = self.camera_ray_geometry(
            camera, offsets)
        idx = camera * self.rays_per_camera + offsets
        return self._sample_geometry(starts, directions, near, far,
                                     idx, step, rng), valid

    def sample_pose_rays(self, ray_m, position, offsets, step=None,
                         rng: Optional[jax.Array] = None):
        """Like :meth:`sample_camera_rays` for an ARBITRARY camera pose
        (``(ray_m, position)`` calibration as traced jit arguments —
        see :meth:`pose_ray_geometry`). RNG keying uses the pixel
        offset as the ray id (free poses have no global ray index);
        eval renders pass no rng, where the id is inert.

        With focus sampling the per-ray CDFs are computed ON THE FLY
        by sweeping the opacity model along the pose's rays — the
        precomputed tables cover only the rig's pixels, so indexing
        them by offset would silently sample an unrelated camera's
        distribution. This adds ``num_focus_samples`` opacity-model
        evaluations per ray per frame (the rig path amortizes the
        same sweep at construction, ray_sampler.py:161-166).

        Returns:
            (RaySamples, valid) — valid marks rays hitting the volume.
        """
        starts, directions, near, far, valid = self.pose_ray_geometry(
            ray_m, position, offsets)
        cdf_rows = None
        if self.focus_sampling:
            cdf_rows = self._cdfs_for_geometry(starts, directions,
                                               near, far)
        return self._sample_geometry(starts, directions, near, far,
                                     offsets, step, rng,
                                     cdf_rows=cdf_rows), valid

    def _cdfs_for_geometry(self, starts, directions, near, far):
        """Focus CDFs for explicit ray geometry (jit-safe): the
        opacity model's softplus density on a ``num_focus_samples``
        linspace grid per ray (ray_sampler.py:59-67, 234-269
        semantics, same math as :meth:`_precompute_cdfs`)."""
        model = self.opacity_model
        num_grid = self.num_focus_samples
        t_values = batch_linspace(near, far, num_grid)
        positions = (starts[:, None, :]
                     + t_values[..., None] * directions[:, None, :])
        flat_pos = positions.reshape(-1, 3)
        if model.use_view:
            views = jnp.broadcast_to(
                directions[:, None, :],
                positions.shape).reshape(-1, 3)
            logits = model.apply(self.opacity_params, flat_pos,
                                 views)[:, -1]
        else:
            logits = model.apply(self.opacity_params, flat_pos)[:, -1]
        opacity = jax.nn.softplus(logits).reshape(-1, num_grid)
        return determine_cdf(t_values, opacity)

    def _sample_geometry(self, starts, directions, near, far, idx,
                         step, rng, cdf_rows=None):
        near0, far0 = near, far  # pre-anneal bounds (CDF domain)
        if step is not None and self.num_anneal_steps > 0:
            near, far = anneal_near_far(near, far, step,
                                        self.anneal_start,
                                        self.num_anneal_steps)

        num_uniform = (self.num_samples // 2 if self.focus_sampling
                       else self.num_samples)

        uniform_jitter = focus_quantiles = None
        if self.stratified and rng is not None:
            uniform_jitter = per_ray_uniform(rng, idx, num_uniform,
                                             salt=0)
            if self.focus_sampling:
                u = per_ray_uniform(rng, idx, self.num_focus_samples,
                                    salt=1)
                if _iid_focus_quantiles():
                    # parity-ablation switch: the reference draws iid
                    # uniforms (ray_sampler.py:310 torch.rand) where
                    # this framework stratifies; sorted-iid is
                    # distributionally identical to the reference's
                    # cat-then-sort. Measured on the full-NeRF
                    # head-to-head: the stratified default converges
                    # ~2 dB faster mid-training (docs/RESULTS.md).
                    focus_quantiles = jnp.sort(u, axis=-1)
                else:
                    strata = jnp.arange(self.num_focus_samples,
                                        dtype=u.dtype)
                    focus_quantiles = ((strata + u)
                                       / self.num_focus_samples)

        t_values = uniform_t_values(near, far, num_uniform,
                                    jitter=uniform_jitter)

        if self.focus_sampling:
            if cdf_rows is None:
                cdf_rows = self.cdfs[idx]
            focus_t = inverse_cdf_t_values(
                near0, far0, cdf_rows,
                self.num_focus_samples, self.num_focus_samples,
                quantiles=focus_quantiles)
            t_values = merge_sorted(t_values, focus_t)

        positions = (starts[:, None, :]
                     + t_values[..., None] * directions[:, None, :])
        view_directions = jnp.broadcast_to(directions[:, None, :],
                                           positions.shape)
        return RaySamples(positions, view_directions, t_values, idx)

    # ------------------------------------------------------------------
    # host-side index helpers
    # ------------------------------------------------------------------

    def to_valid(self, idx) -> np.ndarray:
        """Filters ray indices to those intersecting the volume."""
        idx = np.asarray(idx)
        return idx[self.valid[idx]]

    def _valid_for_camera(self, camera: int) -> np.ndarray:
        start = camera * self.rays_per_camera
        return self.to_valid(np.arange(start, start + self.rays_per_camera))

    def _sample_compiled(self, idx: jnp.ndarray) -> RaySamples:
        """Jitted ``sample`` for host-driven (eager) callers.

        Eager sampling dispatches every jnp op separately and
        materializes the bracketing masks unfused — orders of
        magnitude slower through a high-latency runtime. The sampler's
        device arrays are passed as jit ARGUMENTS (not closure
        constants) so whole-orbit geometry never bloats the compile
        payload; see Raycaster._frame_fn for the same pattern.
        """
        if getattr(self, "_jit_sample", None) is None:
            import copy

            array_names = tuple(
                name for name, value in vars(self).items()
                if isinstance(value, jnp.ndarray))

            @jax.jit
            def sample_fn(geometry, idx):
                traced = copy.copy(self)
                for name, value in geometry.items():
                    object.__setattr__(traced, name, value)
                return traced.sample(idx)

            self._jit_sample = (sample_fn, array_names)
        sample_fn, array_names = self._jit_sample
        # values re-collected per call (names fixed at trace time):
        # caching the dict itself would serve stale occupancy/probe
        # tables after set_occupancy_grid — see Raycaster._frame_fn
        arrays = {name: getattr(self, name) for name in array_names}
        return sample_fn(arrays, idx)

    def rays_for_camera(self, camera: int) -> RaySamples:
        """Returns (deterministic) samples for one camera's valid rays.

        Sampling runs at the fixed shape ``rays_per_camera`` (the
        valid set is padded with ray 0 and sliced off afterwards) so
        one compiled executable serves every camera — per-camera
        valid-ray counts would otherwise recompile per frame.
        """
        idx = self._valid_for_camera(camera)
        pad = self.rays_per_camera - idx.shape[0]
        if pad:
            padded = np.pad(idx, (0, pad))
            rays = self._sample_compiled(jnp.asarray(padded))
            return rays.subset(slice(0, idx.shape[0]))
        return self._sample_compiled(jnp.asarray(idx))

    def __len__(self) -> int:
        """Total number of rays (valid or not)."""
        return self.num_rays

    def to_image(self, camera: int, colors: np.ndarray,
                 color_space: str = "RGB") -> np.ndarray:
        """Scatters per-ray colors back into an (H, W, 3) uint8 image.

        Parity: ray_sampler.py:177-200 — invalid rays render black;
        YCrCb colors are converted to RGB.
        """
        idx = self._valid_for_camera(camera) - camera * self.rays_per_camera
        pixels = np.zeros((self.rays_per_camera, 3), np.float32)
        pixels[idx] = np.asarray(colors)
        pixels = pixels.reshape(self.image_height, self.image_width, 3)
        pixels = (pixels * 255).astype(np.uint8)
        if color_space == "YCrCb":
            import cv2
            pixels = cv2.cvtColor(pixels, cv2.COLOR_YCrCb2RGB)
        return pixels
