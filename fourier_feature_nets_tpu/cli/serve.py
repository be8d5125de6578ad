"""CLI: persistent render server for a trained model.

Beyond-reference serving surface (the reference stops at batch orbit
rendering, orbit_video.py:84-92): keeps the model and a camera rig's
geometry resident on the accelerator and serves frames over HTTP with
``render_frame_async`` pipelining. See render/server.py for the
endpoint list; `GET /stats` reports the steady-state latency
histogram.
"""

from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

import numpy as np

from ..cameras import Resolution
from ..models import load_model
from ..render import Raycaster
from ..render.server import RenderServer, serve
from ..utils import orbit
from .orbit_video import VECTORS, build_render_sampler


def _parse_args(argv=None):
    parser = ArgumentParser("Render server",
                            formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("model_path", help="Path to the trained model")
    parser.add_argument("resolution", type=int)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8765)
    parser.add_argument("--opacity-model")
    parser.add_argument("--distance", type=float, default=4)
    parser.add_argument("--fov-y-degrees", type=float, default=40)
    parser.add_argument("--num-frames", type=int, default=200,
                        help="Cameras on the served orbit rig")
    parser.add_argument("--up-dir", default="y+", choices=sorted(VECTORS))
    parser.add_argument("--forward-dir", default="z-",
                        choices=sorted(VECTORS))
    parser.add_argument("--num-samples", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=4096)
    parser.add_argument("--chunk-size", type=int, default=16384)
    parser.add_argument("--no-focus", action="store_true")
    parser.add_argument("--octree")
    parser.add_argument("--octree-mode", default="occupancy",
                        choices=["occupancy", "traversal"])
    parser.add_argument("--density-grid", action="store_true",
                        help="Occupancy-guided sampling from the "
                        "model's own density field (fastest serving "
                        "path: culled 32-48 sample frames)")
    parser.add_argument("--density-threshold", type=float, default=1e-3)
    parser.add_argument("--compute-dtype",
                        choices=["float32", "bfloat16"],
                        default="bfloat16")
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard each frame's rays across all "
                        "devices")
    parser.add_argument("--early-term", type=float, default=0.0,
                        help="Early-ray-termination transmittance "
                        "threshold (0 = off; needs an occupancy "
                        "sampler). Measured: ~1.15x at 96 samples "
                        "with eps 1e-2, neutral at 48 "
                        "(docs/RESULTS.md)")
    parser.add_argument("--early-split", type=int, default=0,
                        help="Samples before the termination test "
                        "(0 = half the budget)")
    from .common import add_preset_arg, apply_render_preset
    add_preset_arg(parser)
    return apply_render_preset(parser.parse_args(argv), parser,
                               argv)


def main(argv=None):
    import jax.numpy as jnp

    args = _parse_args(argv)
    cameras = orbit(VECTORS[args.up_dir], VECTORS[args.forward_dir],
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
    sampler = build_render_sampler(args, model, params, cameras, bounds)

    mesh = None
    if args.data_parallel:
        from ..parallel import make_mesh
        mesh = make_mesh()

    server = RenderServer(raycaster, params, sampler,
                          chunk_size=args.chunk_size, mesh=mesh,
                          early_term=args.early_term,
                          early_split=args.early_split)
    print(f"compiling frame executable "
          f"({args.resolution}x{args.resolution}, "
          f"{args.num_samples} samples)...")
    warmup = server.warmup()
    print(f"compiled in {warmup:.1f}s; serving "
          f"{args.num_frames} cameras on "
          f"http://{args.host}:{args.port}")
    http = serve(server, args.host, args.port)
    try:
        http.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        http.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
