"""CLI: visual inspection of ray sampling (the reference's
test_ray_sampling.py, /root/reference/test_ray_sampling.py).

The reference emits an interactive scenepic HTML; without that
dependency this tool writes diagnostic PNGs instead: per sampling
mode, the selected-pixel masks for each camera, plus a depth
histogram of sampled t values (deterministic vs stratified vs
opacity-focused)."""

import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

import numpy as np

from ..datasets import ImageDataset, Mode
from . import common


def _parse_args(argv=None):
    parser = ArgumentParser("Ray Sampling Inspector",
                            formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("data_path", help="Path to the data NPZ "
                        "(or 'synthetic[:res]')")
    parser.add_argument("output_dir")
    parser.add_argument("--num-cameras", type=int, default=4)
    parser.add_argument("--num-samples", type=int, default=32)
    parser.add_argument("--stratified", action="store_true")
    parser.add_argument("--opacity-model",
                        help="Optional opacity model for focus sampling")
    return parser.parse_args(argv)


def main(argv=None):
    import cv2
    import jax

    args = _parse_args(argv)
    args.data_path = common.resolve_data_path(args.data_path)
    os.makedirs(args.output_dir, exist_ok=True)

    opacity_model, opacity_params = common.load_opacity(
        args.opacity_model, args)
    dataset = ImageDataset.load(args.data_path, "train",
                                args.num_samples,
                                stratified=args.stratified,
                                opacity_model=opacity_model,
                                opacity_params=opacity_params)
    if dataset is None:
        return 1
    dataset = dataset.sample_cameras(args.num_cameras, args.num_samples,
                                     args.stratified)

    modes = [Mode.Full, Mode.Sparse, Mode.Center]
    if len(dataset.dilate_index):
        modes.append(Mode.Dilate)

    resolution = dataset.cameras[0].resolution
    for mode in modes:
        dataset.mode = mode
        for camera in range(dataset.num_cameras):
            mask = np.zeros(resolution.width * resolution.height,
                            np.uint8)
            mask[dataset.index_for_camera(camera)] = 255
            mask = mask.reshape(resolution.height, resolution.width)
            overlay = dataset.images[camera][..., :3].copy()
            overlay[mask == 0] //= 4
            name = f"{mode.name.lower()}_cam{camera:03d}.png"
            cv2.imwrite(os.path.join(args.output_dir, name),
                        cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
    dataset.mode = Mode.Full

    # depth-distribution diagnostic
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    idx = dataset.index_pool()[:256]
    rng = jax.random.PRNGKey(0) if args.stratified else None
    rays = dataset.sampler.sample(np.asarray(idx), 0, rng)
    t = np.asarray(rays.t_values)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.hist(t.reshape(-1), bins=100)
    ax.set_xlabel("t")
    ax.set_title("sampled depth distribution"
                 + (" (stratified)" if args.stratified else "")
                 + (" (opacity-focused)" if opacity_model else ""))
    fig.tight_layout()
    fig.savefig(os.path.join(args.output_dir, "t_histogram.png"))
    print("Wrote sampling diagnostics to", args.output_dir)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
