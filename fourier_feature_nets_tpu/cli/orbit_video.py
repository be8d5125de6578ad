"""CLI: renders an orbit video of a trained model.

TPU re-design of /root/reference/orbit_video.py: per-frame rendering
runs through one compiled chunked render executable; the model itself
serves as its own opacity model for focus sampling by default
(orbit_video.py:69-73).
"""

import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

import numpy as np

from ..cameras import Resolution
from ..models import load_model
from ..render import Raycaster, RaySampler
from ..utils import ETABar, orbit

VECTORS = {
    "x+": np.array([1, 0, 0], np.float32),
    "x-": np.array([-1, 0, 0], np.float32),
    "y+": np.array([0, 1, 0], np.float32),
    "y-": np.array([0, -1, 0], np.float32),
    "z+": np.array([0, 0, 1], np.float32),
    "z-": np.array([0, 0, -1], np.float32),
}


def _parse_args(argv=None):
    parser = ArgumentParser("Orbit Video Maker",
                            formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("model_path", help="Path to the trained model")
    parser.add_argument("resolution", type=int)
    parser.add_argument("output_dir")
    parser.add_argument("--opacity-model")
    parser.add_argument("--distance", type=float, default=4)
    parser.add_argument("--fov-y-degrees", type=float, default=40)
    parser.add_argument("--num-frames", type=int, default=200)
    parser.add_argument("--up-dir", default="y+", choices=sorted(VECTORS))
    parser.add_argument("--forward-dir", default="z-",
                        choices=sorted(VECTORS))
    parser.add_argument("--num-samples", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--no-focus", action="store_true",
                        help="Disable opacity-guided focus sampling")
    parser.add_argument("--octree",
                        help="Path to an octree NPZ (voxelize_model "
                             "output) for empty-space-skipping "
                             "sample placement")
    parser.add_argument("--octree-mode", default="occupancy",
                        choices=["occupancy", "traversal"],
                        help="occupancy: dense occupancy-grid probes "
                             "(fast); traversal: exact per-ray tree "
                             "marching")
    parser.add_argument("--compute-dtype",
                        choices=["float32", "bfloat16"],
                        default="float32")
    parser.add_argument("--chunked", action="store_true",
                        help="Use the per-chunk dispatch render path "
                             "(render_image) instead of the default "
                             "single-dispatch whole-frame renderer")
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard each frame's rays across all "
                             "devices (shard_map over a 1-D mesh)")
    parser.add_argument("--density-grid", action="store_true",
                        help="Occupancy-guided sampling from the "
                        "model's own density field (no octree file "
                        "needed; best quality-per-sample for "
                        "volumetric scenes)")
    parser.add_argument("--density-threshold", type=float,
                        default=1e-3,
                        help="Per-cell alpha threshold for "
                        "--density-grid")
    parser.add_argument("--early-term", type=float, default=0.0,
                        help="Early-ray-termination transmittance "
                        "threshold (0 = off; needs an occupancy "
                        "sampler). Measured: ~1.15x at 96 samples "
                        "with eps 1e-2, neutral at 48 "
                        "(docs/RESULTS.md)")
    parser.add_argument("--early-split", type=int, default=0,
                        help="Samples before the termination test "
                        "(0 = half the budget)")
    parser.add_argument("--mp4", help="Also assemble the frames into "
                        "this MP4 file")
    parser.add_argument("--framerate", type=float, default=20,
                        help="MP4 frame rate")
    from .common import add_preset_arg, apply_render_preset
    add_preset_arg(parser)
    return apply_render_preset(parser.parse_args(argv), parser,
                               argv)


def build_render_sampler(args, model, params, cameras, bounds):
    """Builds the render-time sampler from the shared CLI flags
    (--density-grid / --octree / focus sampling) — used by both the
    orbit renderer and the render server (cli/serve.py)."""
    if args.density_grid:
        # occupancy from the model's own density field (one 64^3
        # model sweep) — best quality-per-sample for volumetric
        # content and needs no octree file (see
        # density_grid_from_model)
        from ..render.occupancy_sampler import OccupancyGridSampler
        return OccupancyGridSampler.from_model(
            model, params, cameras, args.num_samples,
            alpha_threshold=args.density_threshold, bounds=bounds)
    if args.octree:
        from ..octree import OcTree
        tree = OcTree.load(args.octree)
        if args.octree_mode == "occupancy":
            from ..render.occupancy_sampler import OccupancyGridSampler
            return OccupancyGridSampler(tree, cameras,
                                        args.num_samples,
                                        bounds=bounds)
        from ..render import OctreeRaySampler
        return OctreeRaySampler(tree, cameras, args.num_samples,
                                bounds=bounds)
    if args.opacity_model:
        opacity_model, opacity_params = load_model(args.opacity_model)
    elif not args.no_focus:
        opacity_model, opacity_params = model, params
    else:
        opacity_model = opacity_params = None
    return RaySampler(bounds, cameras, args.num_samples, False,
                      opacity_model, opacity_params, args.batch_size)


def main(argv=None):
    import cv2
    import jax.numpy as jnp

    args = _parse_args(argv)
    orbit_cameras = orbit(VECTORS[args.up_dir], VECTORS[args.forward_dir],
                          args.num_frames, args.fov_y_degrees,
                          Resolution(args.resolution, args.resolution),
                          args.distance)
    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)

    model, params = load_model(args.model_path)

    compute_dtype = (jnp.bfloat16 if args.compute_dtype == "bfloat16"
                     else None)
    # fused=None: auto (Pallas kernel for NeRF when compute
    # dispatches to TPU; XLA elsewhere — forcing it would crash on a
    # CPU-pinned host, the kernel is TPU Mosaic)
    raycaster = Raycaster(model, compute_dtype=compute_dtype)

    sampler = build_render_sampler(args, model, params, orbit_cameras,
                                   bounds)

    os.makedirs(args.output_dir, exist_ok=True)
    progress = ETABar("Rendering", max=args.num_frames)

    def write(frame, image):
        path = os.path.join(args.output_dir,
                            "frame_{:05d}.png".format(frame))
        cv2.imwrite(path, cv2.cvtColor(np.asarray(image),
                                       cv2.COLOR_RGB2BGR))

    if args.chunked:
        if args.data_parallel or args.early_term:
            import sys
            print("WARNING: --chunked is the single-device parity "
                  "path; --data-parallel/--early-term are ignored",
                  file=sys.stderr)
        for frame in range(args.num_frames):
            progress.next()
            write(frame, raycaster.render_image(params, sampler, frame,
                                                args.batch_size))
    else:
        mesh = None
        if args.data_parallel:
            from ..parallel import make_mesh
            mesh = make_mesh()
        # pipelined: dispatch frame f before fetching/writing f-1 so
        # the device computes while the host transfers and encodes
        pending = None
        for frame in range(args.num_frames):
            progress.next()
            buffer = raycaster.render_frame_async(
                params, sampler, frame, chunk_size=args.batch_size * 4,
                mesh=mesh, early_term=args.early_term,
                early_split=args.early_split)
            if pending is not None:
                write(frame - 1, pending)
            pending = buffer
        write(args.num_frames - 1, pending)
    progress.finish()

    if args.mp4:
        size = (args.resolution, args.resolution)
        writer = cv2.VideoWriter(args.mp4,
                                 cv2.VideoWriter_fourcc(*"mp4v"),
                                 args.framerate, size)
        for frame in range(args.num_frames):
            path = os.path.join(args.output_dir,
                                "frame_{:05d}.png".format(frame))
            writer.write(cv2.imread(path))
        writer.release()
        print(f"wrote {args.mp4}: {args.num_frames} frames")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
