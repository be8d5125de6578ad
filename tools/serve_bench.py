"""Steady-state render-server measurement on a trained model
(real TPU): serves an 800px orbit over real HTTP, streams frames
through the pipelined MJPEG endpoint, and prints the /stats latency
histogram — the serving-loop validation of the production frame path.

Usage: python -m tools.serve_bench <model.npz> [resolution] [samples]
           [--early-term EPS] [--early-split K] [--preset NAME]
           [--clients N [N ...]]

``--preset fast|quality`` applies the named serving configuration
(cli/common.py RENDER_PRESETS) exactly as ``ffn-serve --preset``
would, so the recorded numbers describe the shipped preset.

``--clients 1 2 4`` additionally measures concurrent-client serving:
for each N it opens N simultaneous MJPEG streams (staggered start
cameras) against the same server and reports aggregate FPS plus
per-client inter-frame p50/p90 — the measured backing for the FIFO
multi-client scheduling claim (render/server.py RenderServer).
"""

import argparse
import json
import socket
import threading
import time
import urllib.request


def _stream_frames(url: str, start: int, count: int, out: list):
    """Streams ``count`` MJPEG frames, recording each frame-boundary
    arrival time (host-side perf_counter) into ``out``."""
    marker = b"--ffnframe"
    request = urllib.request.urlopen(
        f"{url}/stream.mjpeg?start={start}&count={count}", timeout=600)
    buffer = b""
    seen = 0
    # read1 returns as soon as ANY bytes arrive; plain read(n) blocks
    # until n bytes accumulate, which would timestamp several small
    # frames in one burst (cadence artifact at low resolutions)
    read_some = getattr(request, "read1", None) or request.read
    try:
        while seen < count:
            chunk = read_some(65536)
            if not chunk:
                break
            buffer += chunk
            while True:
                index = buffer.find(marker)
                if index < 0:
                    # keep a marker-sized tail in case it straddles
                    buffer = buffer[-len(marker):]
                    break
                buffer = buffer[index + len(marker):]
                out.append(time.perf_counter())
                seen += 1
    finally:
        request.close()


def _measure_clients(url: str, num_clients: int, num_cameras: int,
                     frames_per_client: int):
    """N concurrent MJPEG streams; returns (aggregate_fps, per-client
    [(p50_ms, p90_ms), ...], total_frames)."""
    import numpy as np

    arrivals = [[] for _ in range(num_clients)]
    threads = [
        threading.Thread(
            target=_stream_frames,
            args=(url, (i * num_cameras) // num_clients,
                  frames_per_client, arrivals[i]))
        for i in range(num_clients)
    ]
    wall_start = time.perf_counter()
    for thread in threads:
        thread.start()
    for thread in threads:
        thread.join()
    wall = time.perf_counter() - wall_start
    total = sum(len(a) for a in arrivals)
    per_client = []
    for a in arrivals:
        # first boundary precedes frame 0's payload: gaps between
        # boundaries are the per-frame arrival cadence
        gaps = np.diff(np.asarray(a)) * 1e3
        if gaps.size:
            per_client.append((float(np.percentile(gaps, 50)),
                               float(np.percentile(gaps, 90))))
        else:
            per_client.append((float("nan"), float("nan")))
    return total / wall, per_client, total


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
    parser.add_argument("--clients", type=int, nargs="+", default=[],
                        help="Concurrency levels to measure (e.g. "
                             "--clients 1 2 4): N simultaneous MJPEG "
                             "streams, aggregate FPS + per-client "
                             "inter-frame p50/p90")
    parser.add_argument("--frames-per-client", type=int, default=24)
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

    # multi-client concurrency (after the single-stream steady state
    # so the 1-client row shares its warm caches)
    client_rows = []
    for n in args.clients:
        fps, per_client, total = _measure_clients(
            url, n, len(cameras), args.frames_per_client)
        client_rows.append((n, fps, per_client, total))

    # free-camera latency: synchronous POST /pose requests at novel
    # poses (first one compiles the pose executable — excluded)
    from fourier_feature_nets_tpu.utils.camera_paths import (
        look_at_extrinsics,
    )
    rng = np.random.default_rng(0)

    def pose_payload():
        azimuth = rng.uniform(0, 2 * np.pi)
        altitude = rng.uniform(0.1, 0.9)
        position = 4.0 * np.array([
            np.sin(azimuth) * np.cos(altitude), np.sin(altitude),
            np.cos(azimuth) * np.cos(altitude)])
        extrinsics = look_at_extrinsics(position, [0.0, 1.0, 0.0])
        return json.dumps({"extrinsics": extrinsics.tolist(),
                           "format": "raw"}).encode()

    def post_pose(payload):
        request = urllib.request.Request(url + "/pose", data=payload,
                                         method="POST")
        with urllib.request.urlopen(request, timeout=600) as resp:
            resp.read()
        return time.perf_counter()

    pose_ms = []
    for index in range(13):
        start = time.perf_counter()
        done = post_pose(pose_payload())
        if index > 0:  # skip the compile
            pose_ms.append((done - start) * 1e3)

    # pipelined free-pose: 2 requests in flight (the server dispatcher
    # pipelines across requests exactly like the MJPEG stream does) —
    # resolve-to-resolve cadence, apples-to-apples with the stream p50
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as pool:
        futures = [pool.submit(post_pose, pose_payload())
                   for _ in range(14)]
        finish_times = [f.result() for f in futures]
    gaps = np.diff(sorted(finish_times))[1:] * 1e3  # drop pipeline fill
    pose_pipe_ms = gaps
    http.shutdown()

    print(f"streamed {frames} frames at {res}x{res}, "
          f"{samples} samples/ray")
    print(json.dumps(stats, indent=2))
    print(f"steady-state: {stats['fps']:.2f} FPS/chip "
          f"(p50 {stats['p50_ms']:.0f} ms, p99 {stats['p99_ms']:.0f} ms)")
    print(f"free-pose request latency: p50 "
          f"{np.percentile(pose_ms, 50):.0f} ms, p90 "
          f"{np.percentile(pose_ms, 90):.0f} ms over "
          f"{len(pose_ms)} novel poses (synchronous round trips)")
    print(f"free-pose PIPELINED (2 in flight): p50 "
          f"{np.percentile(pose_pipe_ms, 50):.0f} ms, p90 "
          f"{np.percentile(pose_pipe_ms, 90):.0f} ms "
          f"resolve-to-resolve -> "
          f"{1e3 / np.mean(pose_pipe_ms):.2f} FPS free camera")
    for n, fps, per_client, total in client_rows:
        detail = ", ".join(
            f"client{i}: p50 {p50:.0f}/p90 {p90:.0f} ms"
            for i, (p50, p90) in enumerate(per_client))
        print(f"{n} concurrent client(s): aggregate {fps:.2f} FPS "
              f"({total} frames) — {detail}")


if __name__ == "__main__":
    main()
