"""CLI: converts a trained radiance-field model into a sparse octree.

TPU re-design of /root/reference/voxelize_model.py: all train rays are
rendered with depth on device, surface points (alpha > threshold) at
``start + depth * direction`` form a point cloud, and the native
octree builder fits a sparse tree to it.
"""

import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

from ..datasets import ImageDataset
from ..models import load_model
from ..octree import OcTree
from ..render import Raycaster
from . import common


def _parse_args(argv=None):
    parser = ArgumentParser("Model Voxelizer",
                            formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("model_path", help="Path to the trained model")
    parser.add_argument("data_path", help="Path to the data NPZ "
                        "(or 'synthetic[:res]')")
    parser.add_argument("output_path", help="Output NPZ path")
    parser.add_argument("--num-samples", type=int, default=128)
    parser.add_argument("--num-cameras", type=int, default=100,
                        help="Max cameras used for the sweep "
                        "(voxelize_model.py:20-21)")
    parser.add_argument("--batch-size", type=int, default=16384)
    parser.add_argument("--depth", type=int, default=8,
                        help="Octree depth")
    parser.add_argument("--min-leaf-size", type=int, default=4)
    parser.add_argument("--alpha-threshold", type=float, default=0.3)
    parser.add_argument("--color-space", choices=["YCrCb", "RGB"],
                        default="RGB")
    parser.add_argument("--fused", action="store_true", default=None,
                        help="Force the fused Pallas NeRF kernel for "
                        "the sweep (default: auto — on for NeRF on "
                        "TPU)")
    parser.add_argument("--no-fused", dest="fused", action="store_false",
                        help="Force the XLA render path")
    return parser.parse_args(argv)


def main(argv=None):
    args = _parse_args(argv)
    args.data_path = common.resolve_data_path(args.data_path)

    model, params = load_model(args.model_path)
    dataset = ImageDataset.load(args.data_path, "train",
                                args.num_samples,
                                color_space=args.color_space)
    if dataset is None:
        return 1

    if args.num_cameras and args.num_cameras < dataset.num_cameras:
        dataset = dataset.sample_cameras(args.num_cameras,
                                         dataset.num_samples, False)

    raycaster = Raycaster(model, fused=args.fused)
    positions, colors = raycaster.extract_surface(
        params, dataset, args.batch_size, args.alpha_threshold)
    print(f"voxelizing {len(positions)} surface points")
    if len(positions) == 0:
        print("no surface points above --alpha-threshold "
              f"{args.alpha_threshold} — is the model trained? Try a "
              "lower threshold.")
        return 1

    tree = OcTree.build_from_samples(positions, args.depth,
                                     args.min_leaf_size, colors)
    print(f"octree: {tree.num_leaves} leaves, depth {tree.depth}")
    os.makedirs(os.path.dirname(os.path.abspath(args.output_path)),
                exist_ok=True)
    tree.save(args.output_path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
