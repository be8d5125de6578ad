"""A/B of the culled frame renderer's probe_subsample setting on the
bench.py 800x800 orbit scene (real TPU).

For each stride s in (1, 2, 4): frame time via the pipelined best-of-N
protocol (bench.py methodology) plus an image cross-check against the
exact per-ray probe (s=1) — the coarse raster must be a conservative
superset (no pixel rendered by s=1 may go black) and hit-pixel colors
must match bit-exactly.

Usage: python -m tools.probe_subsample_bench [resolution]
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.cameras import Resolution
    from fourier_feature_nets_tpu.models import flagship_nerf
    from fourier_feature_nets_tpu.octree import OcTree
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    from fourier_feature_nets_tpu.render.raycaster import Raycaster
    from fourier_feature_nets_tpu.utils.camera_paths import orbit

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 800

    model = flagship_nerf()
    params = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    cloud = np.concatenate([
        rng.normal([0.2, 0.0, 0.0], 0.2, (20000, 3)),
        [[-1, -1, -1], [1, 1, 1]],
    ]).astype(np.float32)
    tree = OcTree.build_from_samples(cloud, depth=6, min_leaf_size=2)
    cameras = orbit(np.array([0.0, 1.0, 0.0]),
                    np.array([0.0, 0.0, 1.0]), 12, 40.0,
                    Resolution(res, res), 4.0)
    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    sampler = OccupancyGridSampler(tree, cameras, 32,
                                   grid_resolution=64, num_probes=32,
                                   bounds=bounds)
    caster = Raycaster(model, compute_dtype=jnp.bfloat16, fused=True)

    images = {}
    for stride in (1, 2, 4):
        np.asarray(caster.render_frame_async(params, sampler, 0,
                                             probe_subsample=stride))
        images[stride] = np.asarray(caster.render_frame_async(
            params, sampler, 1, probe_subsample=stride))
        num_frames = 6
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            pending = None
            for frame in range(num_frames):
                buffer = caster.render_frame_async(
                    params, sampler, frame + 1,
                    probe_subsample=stride)
                if pending is not None:
                    np.asarray(pending)
                pending = buffer
            np.asarray(pending)
            best = min(best,
                       (time.perf_counter() - start) / num_frames)
        print(f"probe_subsample={stride}: {best * 1e3:.1f} ms/frame "
              f"({1.0 / best:.2f} FPS/chip)")

    exact = images[1]
    rendered = (exact != 0).any(-1)  # pixels the exact probe rendered
    for stride in (2, 4):
        coarse = images[stride]
        same = np.array_equal(coarse[rendered], exact[rendered])
        extra = int(((coarse != 0).any(-1) & ~rendered).sum())
        cov = ((coarse != 0).any(-1).sum()
               / max(int(rendered.sum()), 1))
        print(f"  s={stride}: exact-rendered pixels bit-equal={same}, "
              f"extra rendered pixels={extra}, coverage x{cov:.4f}")
        assert same, f"s={stride} changed rendered pixels"


if __name__ == "__main__":
    main()
