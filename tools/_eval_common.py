"""Shared measurement helpers for the evaluation/bench tools.

One definition of the metrics and timing protocols so the tools can't
drift apart (PSNR floor, GT alpha handling, pipelined-orbit timing
with best-of rounds for tunnel-congestion immunity — see CLAUDE.md).
"""

import time

import numpy as np


def psnr(a, b):
    """PSNR between two uint8 images (protocol: -10*log10(mse))."""
    mse = np.mean(np.square(a.astype(np.float32) / 255.0
                            - b.astype(np.float32) / 255.0))
    return -10.0 * np.log10(max(mse, 1e-10))


def load_val_gt(scene_path: str) -> np.ndarray:
    """Validation-split GT images, RGBA premultiplied over black (the
    renderers output black background)."""
    data = np.load(scene_path)
    train_count = int(data["split_counts"][0])
    val_count = int(data["split_counts"][1])
    gt = data["images"][train_count:train_count + val_count]
    return (gt[..., :3].astype(np.float32)
            * (gt[..., 3:4].astype(np.float32) / 255.0)
            ).astype(np.uint8)


def pipelined_frame_seconds(render_async, num_frames: int = 6,
                            rounds: int = 3) -> float:
    """Best-of-``rounds`` mean seconds/frame over a pipelined loop.

    ``render_async(frame)`` must dispatch and return the device
    buffer without blocking (``Raycaster.render_frame_async``
    signature, partially applied). Frame 0 is rendered once first as
    the compile warmup; the MIN over rounds measures the hardware,
    the outliers measure the tunnel (CLAUDE.md)."""
    np.asarray(render_async(0))
    best = float("inf")
    for _ in range(rounds):
        start = time.perf_counter()
        pending = None
        for frame in range(num_frames):
            buffer = render_async(frame + 1)
            if pending is not None:
                np.asarray(pending)
            pending = buffer
        np.asarray(pending)
        best = min(best, (time.perf_counter() - start) / num_frames)
    return best
