"""Persistent render server.

The reference's only batch render surface is orbit_video.py (frames to
PNG files, orbit_video.py:84-92). This module keeps a trained model
RESIDENT on the accelerator and serves frame requests over HTTP — the
serving shape the single-dispatch `render_frame` path was built for:
device-held geometry, one compile for every camera of a rig, and
`render_frame_async` pipelining so the accelerator computes frame f+1
while frame f crosses the host boundary and encodes.

Endpoints (stdlib http.server, thread-per-request; device work is
owned by a single dispatcher thread that drains a FIFO request queue
and pipelines across clients — see :class:`RenderServer`):

- ``GET /``                           — interactive browser viewer:
  drag to orbit / wheel to zoom, driving ``POST /pose`` requests
  (free camera, up to 2 in flight so the dispatcher pipelines
  compute against the device->host fetch), with a one-click switch
  to the MJPEG orbit stream
- ``GET /info``                       — JSON rig/model description
- ``GET /frame?camera=i&format=png``  — one frame (png/jpg/raw u8)
- ``POST /pose``                      — one frame from an ARBITRARY
  camera pose: JSON body ``{"extrinsics": 4x4, "intrinsics"?: 3x3,
  "format"?: "png"}`` (intrinsics default to the rig's). The pose
  enters the compiled frame function as a traced argument
  (``render_frame_pose``), so after one warmup compile every pose
  request costs a normal frame — free-camera serving, not limited to
  the rig's precompiled cameras.
- ``GET /stream.mjpeg?start=0&count=N&loop=1`` — multipart MJPEG
  stream rendered with async pipelining (steady-state throughput)
- ``GET /stats``                      — JSON latency histogram +
  percentiles over the last 4096 frames
"""

import json
import queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

__all__ = ["RenderServer", "serve"]


class _Request:
    """One frame request in flight through the dispatcher."""

    __slots__ = ("dispatch", "event", "result", "error")

    def __init__(self, dispatch):
        self.dispatch = dispatch
        self.event = threading.Event()
        self.result = None
        self.error = None


class RenderServer:
    """Model-resident frame renderer with latency accounting.

    Multi-client scheduling: a single dispatcher thread owns the
    device and drains a FIFO request queue, pipelining ACROSS
    clients — request k+1 is dispatched before request k's frame is
    fetched from the device, so the accelerator computes while the
    host transfers/encodes, regardless of which connection each
    request came from. Streams submit one frame at a time (bounded
    in-flight window), so a looping MJPEG stream shares the device
    fairly with concurrent ``/frame`` and ``/pose`` clients instead
    of monopolizing it."""

    def __init__(self, raycaster, params, sampler,
                 chunk_size: int = 16384, cull_empty: bool = True,
                 mesh=None, early_term: float = 0.0,
                 early_split: int = 0):
        self.raycaster = raycaster
        self.params = params
        self.sampler = sampler
        self.chunk_size = chunk_size
        self.cull_empty = cull_empty
        self.mesh = mesh
        self.early_term = early_term
        self.early_split = early_split
        self.num_cameras = sampler.num_cameras
        self.resolution = (sampler.image_height, sampler.image_width)
        self._latencies = deque(maxlen=4096)
        # guards iteration (stats) against concurrent resolver appends:
        # CPython raises "deque mutated during iteration" otherwise
        self._latency_lock = threading.Lock()
        self._queue = queue.SimpleQueue()
        self._fetch_queue = queue.SimpleQueue()
        self._submit_lock = threading.Lock()
        self._stopped = False
        self._last_resolve = 0.0
        self._dispatcher = threading.Thread(target=self._run_dispatch,
                                            daemon=True)
        self._resolver = threading.Thread(target=self._run_resolve,
                                          daemon=True)
        self._dispatcher.start()
        self._resolver.start()

    # ------------------------------------------------------------------
    # dispatcher + resolver threads. The dispatcher issues device work
    # the moment requests arrive (render_frame_*_async returns without
    # blocking, so compute queues back-to-back on the accelerator);
    # the resolver fetches results in dispatch order on its own
    # thread, so a frame's device->host transfer and the next frame's
    # compute overlap without any timing heuristics. In-flight depth
    # is bounded by what clients keep queued (streams cap themselves
    # at 2).

    def _run_dispatch(self):
        while True:
            request = self._queue.get()
            if request.dispatch is None:  # close()
                self._fetch_queue.put((request, None, 0.0))
                return
            start = time.perf_counter()
            try:
                buffer = request.dispatch()
            except Exception as error:  # surface to the client
                request.error = error
                request.event.set()
                continue
            self._fetch_queue.put((request, buffer, start))

    def _run_resolve(self):
        while True:
            request, buffer, start = self._fetch_queue.get()
            if request.dispatch is None:  # close() sentinel
                request.event.set()
                return
            try:
                request.result = np.asarray(buffer)
            except Exception as error:
                request.error = error
            now = time.perf_counter()
            # steady state this measures resolve-to-resolve throughput
            # (back-to-back frames); for an isolated request it is the
            # dispatch-to-fetch latency
            with self._latency_lock:
                self._latencies.append(now - max(start,
                                                 self._last_resolve))
            self._last_resolve = now
            request.event.set()

    def _submit(self, dispatch) -> _Request:
        # lock so a submit cannot slip in behind close()'s sentinel
        # (the dispatcher exits at the sentinel and a later request
        # would never resolve)
        with self._submit_lock:
            if self._stopped:
                raise RuntimeError("render server is closed")
            request = _Request(dispatch)
            self._queue.put(request)
        return request

    @staticmethod
    def _wait(request) -> np.ndarray:
        request.event.wait()
        if request.error is not None:
            raise request.error
        return request.result

    def close(self):
        """Stops the dispatcher thread (resolving any pending frame)."""
        with self._submit_lock:
            if self._stopped:
                return
            self._stopped = True
            sentinel = _Request(None)
            self._queue.put(sentinel)
        sentinel.event.wait()

    # ------------------------------------------------------------------

    def _dispatch(self, camera: int):
        return self.raycaster.render_frame_async(
            self.params, self.sampler, camera,
            chunk_size=self.chunk_size, cull_empty=self.cull_empty,
            mesh=self.mesh, early_term=self.early_term,
            early_split=self.early_split)

    def warmup(self) -> float:
        """Compiles the frame executable (first call is slow); returns
        the warmup seconds. The compile time is dropped from the
        latency stats (it would dominate every percentile until 4096
        real frames aged it out)."""
        start = time.perf_counter()
        self.frame(0)
        with self._latency_lock:
            self._latencies.clear()
        return time.perf_counter() - start

    def frame(self, camera: int) -> np.ndarray:
        """Renders one frame synchronously; records latency."""
        return self._wait(self._submit(lambda: self._dispatch(camera)))

    def frame_pose(self, extrinsics, intrinsics=None) -> np.ndarray:
        """Renders one frame from an arbitrary camera pose.

        ``extrinsics`` is the 4x4 camera-to-world matrix; intrinsics
        default to the rig's first camera. One executable (compiled on
        the first pose request) serves every pose at the rig's
        resolution (``Raycaster.render_frame_pose``)."""
        from ..cameras import CameraInfo, Resolution
        rig = self.sampler.cameras[0]
        if intrinsics is None:
            intrinsics = rig.intrinsics
        camera = CameraInfo.create(
            "pose", Resolution(*rig.resolution), intrinsics, extrinsics)

        def dispatch():
            return self.raycaster.render_frame_pose_async(
                self.params, self.sampler, camera,
                chunk_size=self.chunk_size, cull_empty=self.cull_empty,
                mesh=self.mesh, early_term=self.early_term,
                early_split=self.early_split)

        return self._wait(self._submit(dispatch))

    def frames(self, cameras):
        """Pipelined frame generator: keeps up to two requests in
        flight so the dispatcher overlaps frame f+1's compute with
        frame f's host transfer/encode, while OTHER clients' requests
        can interleave between them (FIFO fairness)."""
        in_flight = deque()
        for camera in cameras:
            in_flight.append(
                self._submit(lambda c=camera: self._dispatch(c)))
            if len(in_flight) >= 2:
                yield self._wait(in_flight.popleft())
        while in_flight:
            yield self._wait(in_flight.popleft())

    def stats(self) -> dict:
        """Latency histogram (10 ms bins) + percentiles + FPS."""
        with self._latency_lock:
            lat = np.asarray(self._latencies, np.float64)
        if lat.size == 0:
            return {"frames": 0}
        ms = lat * 1e3
        edges = np.arange(0, np.ceil(ms.max() / 10) * 10 + 10, 10)
        counts, _ = np.histogram(ms, bins=edges)
        return {
            "frames": int(lat.size),
            "mean_ms": float(ms.mean()),
            "p50_ms": float(np.percentile(ms, 50)),
            "p90_ms": float(np.percentile(ms, 90)),
            "p99_ms": float(np.percentile(ms, 99)),
            "fps": float(1e3 / ms.mean()),
            "histogram_ms": {
                f"{int(lo)}-{int(hi)}": int(n)
                for lo, hi, n in zip(edges[:-1], edges[1:], counts)
                if n
            },
        }


# Interactive viewer: drag = orbit, wheel = zoom. The pose math
# mirrors utils.camera_paths.look_at_extrinsics (camera at a
# spherical position looking at the origin, y-up, OpenCV x-flip) so
# browser poses land exactly on the rig's convention.
_VIEWER_HTML = """<!DOCTYPE html>
<html><head><title>fourier_feature_nets_tpu viewer</title><style>
body { background: #111; color: #ccc; font-family: monospace;
       display: flex; flex-direction: column; align-items: center; }
img { image-rendering: pixelated; border: 1px solid #444;
      cursor: grab; touch-action: none; }
#bar { margin: 8px; }
button { background: #222; color: #ccc; border: 1px solid #555;
         font-family: monospace; padding: 4px 10px; cursor: pointer; }
</style></head><body>
<div id="bar">
  <button id="mode">stream orbit</button>
  <span id="status">free camera: drag to orbit, wheel to zoom</span>
</div>
<img id="view" width="512" height="512" draggable="false">
<script>
const view = document.getElementById('view');
const status_el = document.getElementById('status');
let az = 0.6, alt = 0.45, dist = 4.0, streaming = false;
// Up to 2 pose requests in flight: the server's dispatcher thread
// pipelines across queued requests (frame k+1 computes while frame
// k's device->host fetch runs), so a serial await leaves the
// accelerator idle during every fetch. Sequence-guarded so a
// stale response never replaces a newer frame.
let inflight = 0, dirty = true, seq = 0, shown = 0;

function pose() {
  const ca = Math.cos(az), sa = Math.sin(az);
  const cl = Math.cos(alt), sl = Math.sin(alt);
  const p = [dist * sa * cl, dist * sl, dist * ca * cl];
  const n = Math.hypot(...p);
  const f = p.map(v => v / n);            // camera +z through camera
  const up = [0, 1, 0];
  let r = [up[1] * f[2] - up[2] * f[1],
           up[2] * f[0] - up[0] * f[2],
           up[0] * f[1] - up[1] * f[0]];
  const rn = Math.hypot(...r);
  r = r.map(v => v / rn);
  const tu = [f[1] * r[2] - f[2] * r[1],
              f[2] * r[0] - f[0] * r[2],
              f[0] * r[1] - f[1] * r[0]];
  // columns (right, -true_up, -forward, position): the x-flip
  return [[r[0], -tu[0], -f[0], p[0]],
          [r[1], -tu[1], -f[1], p[1]],
          [r[2], -tu[2], -f[2], p[2]],
          [0, 0, 0, 1]];
}

async function refresh() {
  if (inflight >= 2 || streaming) { return; }
  inflight += 1; dirty = false;
  const my = ++seq;
  const t0 = performance.now();
  try {
    const resp = await fetch('/pose', {method: 'POST',
      body: JSON.stringify({extrinsics: pose(), format: 'jpg'})});
    if (!resp.ok) {
      status_el.textContent = 'server error: ' + await resp.text();
      inflight -= 1; return;
    }
    const blob = await resp.blob();
    if (my > shown) {  // never let a stale frame overwrite a newer one
      shown = my;
      const url = URL.createObjectURL(blob);
      const old = view.src;
      view.src = url;
      if (old.startsWith('blob:')) { URL.revokeObjectURL(old); }
      status_el.textContent = `pose ${(performance.now() - t0).toFixed(0)} ms` +
        `  az ${az.toFixed(2)} alt ${alt.toFixed(2)} dist ${dist.toFixed(2)}`;
    }
  } catch (e) { status_el.textContent = 'error: ' + e; }
  inflight -= 1;
  if (dirty) { refresh(); }
}

let drag = null;
view.addEventListener('pointerdown', e => {
  drag = [e.clientX, e.clientY]; view.setPointerCapture(e.pointerId);
});
view.addEventListener('pointermove', e => {
  if (!drag || streaming) { return; }
  az -= (e.clientX - drag[0]) * 0.01;
  alt = Math.min(1.4, Math.max(-1.4, alt + (e.clientY - drag[1]) * 0.01));
  drag = [e.clientX, e.clientY];
  dirty = true; refresh();
});
view.addEventListener('pointerup', () => { drag = null; });
view.addEventListener('wheel', e => {
  if (streaming) { return; }
  e.preventDefault();
  dist = Math.min(12, Math.max(1.2, dist * (1 + e.deltaY * 0.001)));
  dirty = true; refresh();
}, {passive: false});

document.getElementById('mode').addEventListener('click', () => {
  streaming = !streaming;
  document.getElementById('mode').textContent =
    streaming ? 'free camera' : 'stream orbit';
  if (streaming) {
    status_el.textContent = 'streaming the precompiled orbit rig';
    view.src = '/stream.mjpeg?loop=1';
  } else {
    status_el.textContent = 'free camera: drag to orbit, wheel to zoom';
    view.src = ''; dirty = true; refresh();
  }
});

fetch('/info').then(r => r.json()).then(info => {
  view.width = Math.max(info.width, 256);
  view.height = Math.max(info.height, 256);
  refresh();
});
</script></body></html>
"""


def _make_handler(server: RenderServer):
    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code, content_type, body):
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, payload):
            self._send(200, "application/json",
                       json.dumps(payload).encode())

        def _send_image(self, image, fmt):
            if fmt == "raw":
                self._send(200, "application/octet-stream",
                           image.tobytes())
            else:
                ext = ".jpg" if fmt in ("jpg", "jpeg") else ".png"
                ok, buf = cv2.imencode(
                    ext, cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
                assert ok
                mime = "image/jpeg" if ext == ".jpg" else "image/png"
                self._send(200, mime, buf.tobytes())

        def do_POST(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            try:
                if url.path == "/pose":
                    length = int(self.headers.get("Content-Length", 0))
                    request = json.loads(self.rfile.read(length))
                    extrinsics = np.asarray(request["extrinsics"],
                                            np.float32)
                    intrinsics = request.get("intrinsics")
                    if intrinsics is not None:
                        intrinsics = np.asarray(intrinsics, np.float32)
                    image = server.frame_pose(extrinsics, intrinsics)
                    self._send_image(image, request.get("format", "png"))
                else:
                    self._send(404, "text/plain", b"not found")
            except (BrokenPipeError, ConnectionResetError):
                pass
            except Exception as error:  # surface errors to the client
                self._send(500, "text/plain", str(error).encode())

        def do_GET(self):  # noqa: N802 (http.server API)
            url = urlparse(self.path)
            query = {k: v[-1] for k, v in parse_qs(url.query).items()}
            try:
                if url.path == "/":
                    self._send(200, "text/html; charset=utf-8",
                               _VIEWER_HTML.encode())
                elif url.path == "/info":
                    self._send_json({
                        "num_cameras": server.num_cameras,
                        "height": server.resolution[0],
                        "width": server.resolution[1],
                        "model_type": server.raycaster.model.model_type,
                        "fused": server.raycaster.fused,
                        "culling": server.cull_empty and hasattr(
                            server.sampler, "probe_cdf"),
                        "pose_endpoint": True,
                    })
                elif url.path == "/stats":
                    self._send_json(server.stats())
                elif url.path == "/frame":
                    camera = int(query.get("camera", 0))
                    fmt = query.get("format", "png")
                    self._send_image(server.frame(camera), fmt)
                elif url.path == "/stream.mjpeg":
                    start = int(query.get("start", 0))
                    count = int(query.get("count", server.num_cameras))
                    loop = int(query.get("loop", 0))
                    boundary = "ffnframe"
                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        f"multipart/x-mixed-replace; boundary={boundary}")
                    self.end_headers()

                    def cameras():
                        while True:
                            for i in range(count):
                                yield (start + i) % server.num_cameras
                            if not loop:
                                return

                    try:
                        for image in server.frames(cameras()):
                            ok, buf = cv2.imencode(
                                ".jpg",
                                cv2.cvtColor(image, cv2.COLOR_RGB2BGR))
                            assert ok
                            payload = buf.tobytes()
                            self.wfile.write(
                                f"--{boundary}\r\nContent-Type: "
                                "image/jpeg"
                                f"\r\nContent-Length: {len(payload)}"
                                "\r\n\r\n".encode())
                            self.wfile.write(payload)
                            self.wfile.write(b"\r\n")
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                    except Exception:
                        # the 200 + multipart headers are already on
                        # the wire: falling through to the generic
                        # handler would write a SECOND status line
                        # into the body (protocol corruption) — just
                        # end the stream (e.g. close() mid-stream)
                        pass
                    return
                else:
                    self._send(404, "text/plain", b"not found")
            except (BrokenPipeError, ConnectionResetError):
                pass
            except Exception as error:  # surface errors to the client
                self._send(500, "text/plain", str(error).encode())

    return Handler


def serve(server: RenderServer, host: str = "127.0.0.1",
          port: int = 8765) -> ThreadingHTTPServer:
    """Starts the HTTP server (returns it; call ``serve_forever`` or
    use the returned instance's ``shutdown`` from tests)."""
    return ThreadingHTTPServer((host, port), _make_handler(server))
