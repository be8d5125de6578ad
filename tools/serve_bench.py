"""Steady-state render-server measurement on a trained model
(real TPU): serves an 800px orbit over real HTTP, streams frames
through the pipelined MJPEG endpoint, and prints the /stats latency
histogram — the serving-loop validation of the production frame path.

Usage: python -m tools.serve_bench <model.npz> [resolution] [samples]
           [--early-term EPS] [--early-split K] [--preset NAME]

``--preset fast|quality`` applies the named serving configuration
(cli/common.py RENDER_PRESETS) exactly as ``ffn-serve --preset``
would, so the recorded numbers describe the shipped preset.
"""

import argparse
import json
import socket
import threading
import urllib.request


def main():
    import jax.numpy as jnp
    import numpy as np

    from fourier_feature_nets_tpu.cameras import Resolution
    from fourier_feature_nets_tpu.cli.common import RENDER_PRESETS
    from fourier_feature_nets_tpu.models import load_model
    from fourier_feature_nets_tpu.render import Raycaster, RenderServer
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    from fourier_feature_nets_tpu.render.server import serve
    from fourier_feature_nets_tpu.utils.camera_paths import orbit

    parser = argparse.ArgumentParser()
    parser.add_argument("model_path")
    parser.add_argument("resolution", type=int, nargs="?", default=800)
    # sentinel defaults: explicit values must beat the preset (same
    # precedence as ffn-serve's apply_render_preset), preset fills the
    # rest, plain defaults otherwise
    parser.add_argument("samples", type=int, nargs="?", default=None)
    parser.add_argument("--early-term", type=float, default=None)
    parser.add_argument("--early-split", type=int, default=None)
    parser.add_argument("--preset", choices=sorted(RENDER_PRESETS))
    args = parser.parse_args()
    cfg = RENDER_PRESETS[args.preset] if args.preset else {}
    if args.samples is None:
        args.samples = cfg.get("num_samples", 48)
    if args.early_term is None:
        args.early_term = cfg.get("early_term", 0.0)
    if args.early_split is None:
        args.early_split = cfg.get("early_split", 0)
    model_path = args.model_path
    res = args.resolution
    samples = args.samples

    model, params = load_model(model_path)
    cameras = orbit(np.array([0.0, 1.0, 0.0]),
                    np.array([0.0, 0.0, -1.0]), 40, 40.0,
                    Resolution(res, res), 4.0)
    bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    sampler = OccupancyGridSampler.from_model(
        model, params, cameras, samples, bounds=bounds)
    caster = Raycaster(model, compute_dtype=jnp.bfloat16)

    server = RenderServer(caster, params, sampler,
                          early_term=args.early_term,
                          early_split=args.early_split)
    print(f"warmup (compile): {server.warmup():.1f}s")

    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
    http = serve(server, "127.0.0.1", port)
    thread = threading.Thread(target=http.serve_forever, daemon=True)
    thread.start()

    url = f"http://127.0.0.1:{port}"
    # steady-state: 30 frames through the pipelined MJPEG stream
    with urllib.request.urlopen(url + "/stream.mjpeg?count=30",
                                timeout=600) as stream:
        body = stream.read()
    frames = body.count(b"--ffnframe")
    with urllib.request.urlopen(url + "/stats", timeout=60) as resp:
        stats = json.loads(resp.read())

    # free-camera latency: synchronous POST /pose requests at novel
    # poses (first one compiles the pose executable — excluded)
    import time

    from fourier_feature_nets_tpu.utils.camera_paths import (
        look_at_extrinsics,
    )
    rng = np.random.default_rng(0)
    pose_ms = []
    for index in range(13):
        azimuth = rng.uniform(0, 2 * np.pi)
        altitude = rng.uniform(0.1, 0.9)
        position = 4.0 * np.array([
            np.sin(azimuth) * np.cos(altitude), np.sin(altitude),
            np.cos(azimuth) * np.cos(altitude)])
        extrinsics = look_at_extrinsics(position, [0.0, 1.0, 0.0])
        payload = json.dumps({"extrinsics": extrinsics.tolist(),
                              "format": "raw"}).encode()
        request = urllib.request.Request(url + "/pose", data=payload,
                                         method="POST")
        start = time.perf_counter()
        with urllib.request.urlopen(request, timeout=600) as resp:
            resp.read()
        if index > 0:  # skip the compile
            pose_ms.append((time.perf_counter() - start) * 1e3)
    http.shutdown()

    print(f"streamed {frames} frames at {res}x{res}, "
          f"{samples} samples/ray")
    print(json.dumps(stats, indent=2))
    print(f"steady-state: {stats['fps']:.2f} FPS/chip "
          f"(p50 {stats['p50_ms']:.0f} ms, p99 {stats['p99_ms']:.0f} ms)")
    print(f"free-pose request latency: p50 "
          f"{np.percentile(pose_ms, 50):.0f} ms, p90 "
          f"{np.percentile(pose_ms, 90):.0f} ms over "
          f"{len(pose_ms)} novel poses")


if __name__ == "__main__":
    main()
