"""Breaks the bench.py 800x800 orbit frame into component timings on
the real TPU: probe, partition, per-chunk sampling, fused kernel.
All timings use the chained-carry method (see bench.py header).

Usage: python -m tools.profile_frame [options]
  --chunk-size N      rays per chunk (default 16384)
  --model PATH        trained checkpoint (default: random-init
                      flagship + synthetic point-cloud octree)
  --num-samples N     samples/ray (default 32; serving preset is 48)
  --density-grid      occupancy from the model's own density field
                      (OccupancyGridSampler.from_model — the serving
                      configuration) instead of the point cloud
"""

import argparse
import sys
import time

import numpy as np


def chain(fn, *args, iters=5):
    import jax.numpy as jnp
    carry = fn(*args, jnp.float32(0.0))
    float(carry)
    start = time.perf_counter()
    for _ in range(iters):
        carry = fn(*args, carry)
    float(carry)
    return (time.perf_counter() - start) / iters


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--chunk-size", type=int, default=16384)
    parser.add_argument("--model", default=None,
                        help="Trained checkpoint; default random-init "
                             "flagship")
    parser.add_argument("--num-samples", type=int, default=32)
    parser.add_argument("--density-grid", action="store_true",
                        help="Occupancy from the model's density "
                             "field (the serving configuration)")
    parser.add_argument("--pose", action="store_true",
                        help="Budget the FREE-POSE frame path "
                             "(render_frame_pose) component by "
                             "component next to the rig path — the "
                             "POST /pose serving gap diagnosis")
    # legacy positional: `profile_frame.py 8192` set the chunk size
    args, extra = parser.parse_known_args()
    if extra and extra[0].isdigit():
        args.chunk_size = int(extra[0])
        extra = extra[1:]
    if extra:
        # anything else left over is a misspelled flag — error instead
        # of silently profiling the wrong configuration
        parser.error(f"unrecognized arguments: {' '.join(extra)}")

    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.cameras import Resolution
    from fourier_feature_nets_tpu.models import flagship_nerf, load_model
    from fourier_feature_nets_tpu.octree import OcTree
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    from fourier_feature_nets_tpu.render.raycaster import Raycaster
    from fourier_feature_nets_tpu.utils.camera_paths import orbit

    if args.model:
        model, params = load_model(args.model)
    else:
        model = flagship_nerf()
        params = model.init(jax.random.PRNGKey(0))
    num_samples = args.num_samples

    cameras = orbit(np.array([0.0, 1.0, 0.0]),
                    np.array([0.0, 0.0, 1.0]), 12, 40.0,
                    Resolution(800, 800), 4.0)
    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    if args.density_grid:
        sampler = OccupancyGridSampler.from_model(
            model, params, cameras, num_samples, bounds=bounds,
            grid_resolution=64, num_probes=32)
    else:
        rng = np.random.default_rng(1)
        cloud = np.concatenate([
            rng.normal([0.2, 0.0, 0.0], 0.2, (20000, 3)),
            [[-1, -1, -1], [1, 1, 1]],
        ]).astype(np.float32)
        tree = OcTree.build_from_samples(cloud, depth=6,
                                         min_leaf_size=2)
        sampler = OccupancyGridSampler(tree, cameras, num_samples,
                                       grid_resolution=64,
                                       num_probes=32, bounds=bounds)
    caster = Raycaster(model, compute_dtype=jnp.bfloat16, fused=True)

    chunk_size = args.chunk_size
    rays_per_cam = sampler.rays_per_camera
    num_chunks = -(-rays_per_cam // chunk_size)
    total = num_chunks * chunk_size
    idx_all = jnp.arange(total, dtype=jnp.int32) % rays_per_cam

    # per-ray tables are lazy (round 2); force the build OUTSIDE jit
    # so tracing the probes below doesn't trigger the host-side
    # np.asarray conversion inside _build_ray_tables
    _ = sampler.starts.shape

    # hit fraction
    @jax.jit
    def count_hits(c):
        _, _, hit = sampler.probe_cdf(idx_all + (c * 0).astype(jnp.int32))
        return jnp.sum(hit.astype(jnp.int32)).astype(jnp.float32)

    hits = float(count_hits(jnp.float32(0.0)))
    print(f"rays {total}, hit {hits:.0f} ({hits / total:.1%}), "
          f"chunks {num_chunks}, hit-chunks ~{int(np.ceil(hits / chunk_size))}",
          file=sys.stderr)

    # 1. whole frame (production path)
    t_frame = chain(
        lambda c: jnp.float32(
            np.asarray(caster.render_frame(params, sampler, 0,
                                           chunk_size=chunk_size)
                       ).mean() * 0 ) + c + 1,
        iters=5)
    print(f"frame total          : {t_frame * 1e3:8.1f} ms")

    # 2. probe_cdf over all rays
    @jax.jit
    def probe_all(c):
        edges, cdf, hit = sampler.probe_cdf(idx_all)
        return c + jnp.sum(cdf[:, -1]) * 1e-9 + jnp.sum(edges[:, 0]) * 0

    print(f"probe all rays       : {chain(probe_all) * 1e3:8.1f} ms")

    # 3. partition (cumsum + scatter perm + unperm scatter)
    @jax.jit
    def partition(c):
        _, _, hit = sampler.probe_cdf(idx_all)
        num_hit = jnp.sum(hit.astype(jnp.int32))
        hit_slot = jnp.cumsum(hit.astype(jnp.int32)) - 1
        miss_slot = num_hit + jnp.cumsum((~hit).astype(jnp.int32)) - 1
        slot = jnp.where(hit, hit_slot, miss_slot)
        perm = jnp.zeros(total, jnp.int32).at[slot].set(
            jnp.arange(total, dtype=jnp.int32))
        colors = jnp.zeros((total, 3)) + c
        unperm = jnp.zeros((total, 3)).at[perm].set(colors)
        return jnp.sum(unperm) * 1e-12 + c

    print(f"probe + partition    : {chain(partition) * 1e3:8.1f} ms")

    # 4. per-chunk sample() (includes the SECOND probe of hit rays)
    idx_chunk = idx_all[:chunk_size]

    @jax.jit
    def sample_chunk(c):
        rays = sampler.sample(idx_chunk + (c * 0).astype(jnp.int32))
        return c + jnp.sum(rays.t_values) * 1e-9

    t_sample = chain(sample_chunk)
    print(f"sample 1 chunk       : {t_sample * 1e3:8.1f} ms "
          f"(x{num_chunks} = {t_sample * num_chunks * 1e3:.1f} ms)")

    # 5. fused kernel on one chunk (sampling excluded: fixed t grid);
    # uses the caster's layout (feature-major default) so the number
    # matches the production frame above
    from fourier_feature_nets_tpu.ops.fused_nerf import fused_nerf_apply
    from fourier_feature_nets_tpu.render.raycaster import _composite

    weights = caster._get_fused_weights(params)
    t_vals = jnp.linspace(1.0, 4.0, num_samples)[None, :].repeat(
        chunk_size, 0)
    d = jax.random.normal(jax.random.PRNGKey(0), (chunk_size, 3))
    d = d / jnp.linalg.norm(d, -1, keepdims=True)
    s = jnp.zeros((chunk_size, 3))
    pos = s[:, None] + t_vals[..., None] * d[:, None]
    views = jnp.broadcast_to(d[:, None], pos.shape)

    @jax.jit
    def kernel_chunk(c):
        flat = fused_nerf_apply(model, weights,
                                (pos + c * 0.0).reshape(-1, 3),
                                views.reshape(-1, 3))
        out = _composite(flat.reshape(chunk_size, num_samples, 4),
                         t_vals, False)
        return c + jnp.sum(out.color) * 1e-9

    t_kernel = chain(kernel_chunk)
    hit_chunks = int(np.ceil(hits / chunk_size))
    print(f"fused kernel 1 chunk : {t_kernel * 1e3:8.1f} ms "
          f"(x{hit_chunks} hit-chunks = {t_kernel * hit_chunks * 1e3:.1f} ms)")

    if args.pose:
        _pose_budget(caster, params, sampler, cameras, chunk_size,
                     idx_all, chain)


def _pose_budget(caster, params, sampler, cameras, chunk_size,
                 idx_all, chain):
    """Free-pose (render_frame_pose) budget next to the rig path at
    identical settings — the POST /pose gap diagnosis (VERDICT r4).

    The pose executable's device graph is structurally identical to
    the rig one (pose_ray_geometry == camera_ray_geometry minus the
    two dynamic_index_in_dim calibration reads; the occupancy CDF is
    probed from the same raster either way) — so any steady gap must
    be either compile-level or protocol-level (synchronous round
    trips vs pipelined streaming)."""
    import time

    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.render.ray_sampler import RaySampler
    from fourier_feature_nets_tpu.utils.camera_paths import (
        look_at_extrinsics,
    )

    total = idx_all.shape[0]
    rng = np.random.default_rng(7)

    def novel_camera():
        azimuth = rng.uniform(0, 2 * np.pi)
        altitude = rng.uniform(0.1, 0.9)
        position = 4.0 * np.array([
            np.sin(azimuth) * np.cos(altitude), np.sin(altitude),
            np.cos(azimuth) * np.cos(altitude)])
        extrinsics = look_at_extrinsics(position, [0.0, 1.0, 0.0])
        rig = cameras[0]
        return rig._replace(extrinsics=extrinsics.astype(np.float32))

    print("--- free-pose path (vs rig, same settings) ---")

    # host-side calibration prep (3x3 inverse + pack)
    cam = novel_camera()
    start = time.perf_counter()
    for _ in range(20):
        calibration = RaySampler.pose_calibration(cam)
    t_cal = (time.perf_counter() - start) / 20
    print(f"pose_calibration host: {t_cal * 1e3:8.2f} ms")

    # warm both executables
    np.asarray(caster.render_frame(params, sampler, 0,
                                   chunk_size=chunk_size))
    np.asarray(caster.render_frame_pose(params, sampler, novel_camera(),
                                        chunk_size=chunk_size))

    # synchronous round trips (the serve_bench POST /pose protocol):
    # dispatch + device compute + full (H,W,3) fetch per frame
    def sync_times(render_one, n=8):
        times = []
        for _ in range(n):
            start = time.perf_counter()
            render_one()
            times.append((time.perf_counter() - start) * 1e3)
        return np.asarray(times)

    rig_sync = sync_times(
        lambda: np.asarray(caster.render_frame(
            params, sampler, int(rng.integers(len(cameras))),
            chunk_size=chunk_size)))
    pose_sync = sync_times(
        lambda: np.asarray(caster.render_frame_pose(
            params, sampler, novel_camera(), chunk_size=chunk_size)))
    print(f"rig frame SYNC       : p50 {np.percentile(rig_sync, 50):7.1f} ms")
    print(f"pose frame SYNC      : p50 {np.percentile(pose_sync, 50):7.1f} ms")

    # pipelined (the MJPEG-stream protocol): dispatch f+1 before
    # fetching f — fetch rides under the next frame's compute
    def pipelined(dispatch_one, n=10):
        start = time.perf_counter()
        pending = None
        for _ in range(n):
            buffer = dispatch_one()
            if pending is not None:
                np.asarray(pending)
            pending = buffer
        np.asarray(pending)
        return (time.perf_counter() - start) / n * 1e3

    rig_pipe = min(pipelined(
        lambda: caster.render_frame_async(
            params, sampler, int(rng.integers(len(cameras))),
            chunk_size=chunk_size)) for _ in range(3))
    pose_pipe = min(pipelined(
        lambda: caster.render_frame_pose_async(
            params, sampler, novel_camera(), chunk_size=chunk_size))
        for _ in range(3))
    print(f"rig frame PIPELINED  : {rig_pipe:7.1f} ms/frame "
          f"({1e3 / rig_pipe:.2f} FPS)")
    print(f"pose frame PIPELINED : {pose_pipe:7.1f} ms/frame "
          f"({1e3 / pose_pipe:.2f} FPS)")

    # device-side pose components (chained): geometry, geometry+probe,
    # one-chunk sampling — the pose analogs of the rig rows above
    m, p = RaySampler.pose_calibration(novel_camera())

    @jax.jit
    def pose_geom(c):
        starts, d, near, far, valid = sampler.pose_ray_geometry(
            m, p, idx_all + (c * 0).astype(jnp.int32))
        return c + jnp.sum(d[:, 0]) * 1e-9 + jnp.sum(near) * 1e-12

    print(f"pose geometry all    : {chain(pose_geom) * 1e3:8.1f} ms")

    @jax.jit
    def pose_probe(c):
        starts, d, near, far, valid = sampler.pose_ray_geometry(
            m, p, idx_all + (c * 0).astype(jnp.int32))
        _, cdf, hit = sampler._probe_cdf_geometry(starts, d, near, far)
        return c + jnp.sum(cdf[:, -1]) * 1e-9

    print(f"pose geom + probe    : {chain(pose_probe) * 1e3:8.1f} ms")

    idx_chunk = idx_all[:chunk_size]

    @jax.jit
    def pose_sample_chunk(c):
        rays, _ = sampler.sample_pose_rays(
            m, p, idx_chunk + (c * 0).astype(jnp.int32))
        return c + jnp.sum(rays.t_values) * 1e-9

    t_ps = chain(pose_sample_chunk)
    num_chunks = total // chunk_size
    print(f"pose sample 1 chunk  : {t_ps * 1e3:8.1f} ms "
          f"(x{num_chunks} = {t_ps * num_chunks * 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
