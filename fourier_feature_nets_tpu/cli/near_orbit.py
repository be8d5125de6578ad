"""CLI: video of the dataset images nearest to an orbit path.

Parity with /root/reference/figures/near_orbit.py:1-70 — for each
camera on a synthetic orbit, picks the training image whose camera is
closest and writes the sequence as an MP4 (cv2 instead of scenepic's
VideoWriter). Useful as a ground-truth companion to orbit_video.py.
"""

from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

import numpy as np

from ..cameras import Resolution
from ..utils.camera_paths import orbit


def _parse_args(argv=None):
    parser = ArgumentParser("Near-orbit ground-truth video",
                            formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("data_path", help="Path to the data NPZ")
    parser.add_argument("mp4_path", help="Output MP4 path")
    parser.add_argument("--num-frames", type=int, default=200)
    parser.add_argument("--up-dir", default="0,1,0")
    parser.add_argument("--forward-dir", default="0,0,-1")
    parser.add_argument("--framerate", type=float, default=10)
    parser.add_argument("--resolution", type=int, default=512)
    parser.add_argument("--distance", type=float, default=3)
    return parser.parse_args(argv)


def main(argv=None):
    import cv2

    args = _parse_args(argv)
    up_dir = np.array([float(x) for x in args.up_dir.split(",")],
                      np.float32)
    forward_dir = np.array([float(x) for x in args.forward_dir.split(",")],
                           np.float32)

    data = np.load(args.data_path)
    images = data["images"]
    height, width = images.shape[1:3]
    src_resolution = Resolution(width, height)
    resolution = src_resolution.scale_to_height(args.resolution).square()
    train_count = int(data["split_counts"][0])
    data_positions = np.stack([ext[:3, 3]
                               for ext in data["extrinsics"][:train_count]])

    orbit_cameras = orbit(up_dir, forward_dir, args.num_frames, 40,
                          resolution, args.distance)
    orbit_positions = np.stack([cam.position[0] for cam in orbit_cameras])

    distances = np.square(orbit_positions[:, None]
                          - data_positions[None]).sum(-1)
    gt_index = distances.argmin(-1)

    writer = cv2.VideoWriter(args.mp4_path,
                             cv2.VideoWriter_fourcc(*"mp4v"),
                             args.framerate,
                             (resolution.width, resolution.height))
    for i in gt_index:
        if width != height:
            # center square crop on the LONG axis (portrait data
            # needs a row crop; a column slice with a negative start
            # silently extracted the wrong region)
            side = min(width, height)
            row0 = (height - side) // 2
            col0 = (width - side) // 2
            image = images[i, row0:row0 + side, col0:col0 + side]
        else:
            image = images[i]
        if image.shape[-1] == 4:
            image = image / 255
            image = image[..., :3] * image[..., 3:]
            image = (image * 255).astype(np.uint8)
        frame = cv2.resize(image, (resolution.width, resolution.height))
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()
    print(f"wrote {args.mp4_path}: {len(gt_index)} frames")


if __name__ == "__main__":
    main()
