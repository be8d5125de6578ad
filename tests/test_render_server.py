"""Persistent render server tests (CPU, tiny scene).

The server keeps a model resident and serves frames over HTTP with
``render_frame_async`` pipelining (render/server.py). These tests
exercise the full stack — sampler geometry as jit arguments, frame
dispatch, JPEG/PNG/raw encodings, the MJPEG stream, and the latency
histogram — through real sockets."""

import json
import socket
import threading
import urllib.request

import jax
import numpy as np
import pytest

import fourier_feature_nets_tpu as ffn
from fourier_feature_nets_tpu.datasets.synthetic import (
    generate_synthetic_dataset,
)
from fourier_feature_nets_tpu.models import Voxels
from fourier_feature_nets_tpu.render import RaySampler, RenderServer
from fourier_feature_nets_tpu.render.server import serve

RES = 20
SAMPLES = 8


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "scene.npz"
    generate_synthetic_dataset(str(path), resolution=RES,
                               split_counts=(3, 1, 1), volume_side=16,
                               num_samples=64)
    dataset = ffn.ImageDataset.load(str(path), "train",
                                    num_samples=SAMPLES)
    model = Voxels(side=8, scale=1.0)
    params = model.init(jax.random.PRNGKey(0))
    caster = ffn.Raycaster(model)
    sampler = RaySampler(dataset.sampler.bounds, dataset.cameras,
                         SAMPLES, False)

    render_server = RenderServer(caster, params, sampler,
                                 chunk_size=128)
    render_server.warmup()

    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]
    http = serve(render_server, "127.0.0.1", port)
    thread = threading.Thread(target=http.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", render_server
    http.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as response:
        return response.read(), response.headers


def test_info(server_url):
    url, _ = server_url
    body, _ = _get(url + "/info")
    info = json.loads(body)
    assert info["num_cameras"] == 3
    assert info["height"] == RES and info["width"] == RES
    assert info["model_type"] == "voxels"


def test_frame_raw_matches_direct_render(server_url):
    url, render_server = server_url
    body, headers = _get(url + "/frame?camera=1&format=raw")
    image = np.frombuffer(body, np.uint8).reshape(RES, RES, 3)
    direct = render_server.raycaster.render_frame(
        render_server.params, render_server.sampler, 1,
        chunk_size=128)
    np.testing.assert_array_equal(image, direct)


def test_frame_png(server_url):
    import cv2
    url, _ = server_url
    body, headers = _get(url + "/frame?camera=0")
    assert headers["Content-Type"] == "image/png"
    decoded = cv2.imdecode(np.frombuffer(body, np.uint8),
                           cv2.IMREAD_COLOR)
    assert decoded.shape == (RES, RES, 3)


def test_stream_and_stats(server_url):
    url, _ = server_url
    request = urllib.request.urlopen(url + "/stream.mjpeg?count=4",
                                     timeout=120)
    body = request.read()
    # 4 multipart JPEG frames
    assert body.count(b"--ffnframe") == 4
    assert body.count(b"Content-Type: image/jpeg") == 4

    stats_body, _ = _get(url + "/stats")
    stats = json.loads(stats_body)
    assert stats["frames"] >= 4
    assert stats["fps"] > 0
    assert stats["p99_ms"] >= stats["p50_ms"]
    assert sum(stats["histogram_ms"].values()) == stats["frames"]


def test_pose_endpoint_matches_rig_frame(server_url):
    """POST /pose with a rig camera's extrinsics == GET /frame."""
    url, render_server = server_url
    camera = render_server.sampler.cameras[2]
    payload = json.dumps({
        "extrinsics": np.asarray(camera.extrinsics).tolist(),
        "intrinsics": np.asarray(camera.intrinsics).tolist(),
        "format": "raw",
    }).encode()
    request = urllib.request.Request(url + "/pose", data=payload,
                                     method="POST")
    with urllib.request.urlopen(request, timeout=120) as response:
        body = response.read()
    posed = np.frombuffer(body, np.uint8).reshape(RES, RES, 3)
    direct, _ = _get(url + "/frame?camera=2&format=raw")
    np.testing.assert_array_equal(
        posed, np.frombuffer(direct, np.uint8).reshape(RES, RES, 3))


def test_pose_endpoint_bad_body_500(server_url):
    url, _ = server_url
    request = urllib.request.Request(
        url + "/pose", data=b"{\"extrinsics\": 3}", method="POST")
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(request, timeout=120)
    assert err.value.code == 500


def test_close_rejects_new_requests(server_url):
    """close() drains the dispatcher and later submits fail fast
    instead of hanging behind the shutdown sentinel."""
    _, render_server = server_url
    extra = RenderServer(render_server.raycaster, render_server.params,
                         render_server.sampler, chunk_size=128)
    assert extra.frame(0).shape == (RES, RES, 3)
    extra.close()
    extra.close()  # idempotent
    with pytest.raises(RuntimeError, match="closed"):
        extra.frame(0)


def test_unknown_path_404(server_url):
    url, _ = server_url
    with pytest.raises(urllib.error.HTTPError) as err:
        _get(url + "/nope")
    assert err.value.code == 404


def test_viewer_page(server_url):
    url, _ = server_url
    body, headers = _get(url + "/")
    assert headers["Content-Type"].startswith("text/html")
    page = body.decode()
    assert "/pose" in page and "/stream.mjpeg" in page


def test_viewer_pose_math_matches_camera_paths():
    """The viewer JS builds extrinsics client-side; its formula must
    equal utils.camera_paths.look_at_extrinsics for the same orbit
    position (replicated here in NumPy)."""
    from fourier_feature_nets_tpu.utils.camera_paths import (
        look_at_extrinsics,
    )
    for az, alt, dist in ((0.6, 0.45, 4.0), (-2.2, -0.8, 2.5),
                          (3.1, 0.0, 6.0)):
        p = np.array([dist * np.sin(az) * np.cos(alt),
                      dist * np.sin(alt),
                      dist * np.cos(az) * np.cos(alt)])
        f = p / np.linalg.norm(p)
        up = np.array([0.0, 1.0, 0.0])
        r = np.cross(up, f)
        r = r / np.linalg.norm(r)
        tu = np.cross(f, r)
        js = np.eye(4)
        js[:3, 0], js[:3, 1], js[:3, 2], js[:3, 3] = r, -tu, -f, p
        np.testing.assert_allclose(js, look_at_extrinsics(p, up),
                                   atol=1e-12)


def test_concurrent_clients(server_url):
    """Many simultaneous clients: every request completes and returns
    the deterministic frame for its camera (the dispatcher serializes
    device work, FIFO)."""
    url, render_server = server_url
    expected = {c: render_server.frame(c) for c in range(3)}
    results = {}
    errors = []

    def fetch(i):
        camera = i % 3
        try:
            body, _ = _get(f"{url}/frame?camera={camera}&format=raw")
            results[i] = (camera,
                          np.frombuffer(body, np.uint8).reshape(
                              RES, RES, 3))
        except Exception as error:  # noqa: BLE001 - collected
            errors.append(error)

    threads = [threading.Thread(target=fetch, args=(i,))
               for i in range(12)]
    for thread in threads:
        thread.start()
    for thread in threads:
        thread.join(timeout=300)
    assert not errors
    assert len(results) == 12
    for camera, image in results.values():
        np.testing.assert_array_equal(image, expected[camera])


def test_looping_stream_does_not_starve_frame_clients(server_url):
    """A ``loop=1`` MJPEG stream must share the device with other
    clients: frame requests issued while the endless stream runs
    complete promptly (the stream submits one request at a time to
    the FIFO queue; the old whole-stream lock starved them forever)."""
    url, _ = server_url
    stream = urllib.request.urlopen(url + "/stream.mjpeg?loop=1",
                                    timeout=120)
    try:
        stream.read(100)  # stream is live
        done = threading.Event()

        def fetch():
            _get(url + "/frame?camera=0&format=raw")
            done.set()

        thread = threading.Thread(target=fetch, daemon=True)
        thread.start()
        assert done.wait(timeout=120), \
            "frame request starved by looping stream"
    finally:
        stream.close()


def test_stats_concurrent_with_rendering(server_url):
    """stats() iterates the latency deque while the resolver thread
    appends — without the lock this intermittently raised
    RuntimeError('deque mutated during iteration') under load."""
    url, render_server = server_url
    errors = []
    done = threading.Event()

    def poll_stats():
        while not done.is_set():
            try:
                render_server.stats()
            except Exception as error:  # noqa: BLE001 - collected
                errors.append(error)
                return

    poller = threading.Thread(target=poll_stats, daemon=True)
    poller.start()
    try:
        for _ in range(3):
            for frame in render_server.frames(range(3)):
                assert frame is not None
    finally:
        done.set()
        poller.join(timeout=30)
    assert not errors, errors


def test_serve_bench_multiclient_helpers(server_url):
    """tools/serve_bench's concurrent-client measurement parses the
    MJPEG stream correctly: every client sees its full frame count
    and the aggregate covers all of them (the --clients backing for
    the multi-client scheduling claim)."""
    import sys

    sys.path.insert(0, ".")
    from tools.serve_bench import _measure_clients, _stream_frames

    url, render_server = server_url
    arrivals = []
    _stream_frames(url, 0, 4, arrivals)
    assert len(arrivals) == 4

    fps, per_client, total = _measure_clients(url, 3,
                                              render_server.num_cameras,
                                              5)
    assert total == 15
    assert fps > 0
    assert len(per_client) == 3
    for p50, p90 in per_client:
        assert np.isfinite(p50) and np.isfinite(p90)
        assert p90 >= p50 > 0
