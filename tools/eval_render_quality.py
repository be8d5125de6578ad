"""Quality cost of the production render path at flagship scale.

Renders the 800px synthetic scene's VAL cameras (novel views for the
trained model) three ways and reports PSNR against the dataset GT:
  1. brute force: 128 uniform samples/ray (reference protocol)
  2. occupancy 32 samples + empty-space culling (bench.py headline)
  3. occupancy 24 samples + culling (cheaper dial)

Usage: python -m tools.eval_render_quality <model.npz> <octree.npz> \
           <scene.npz>
"""

import sys

import numpy as np

from tools._eval_common import load_val_gt, psnr


def main():
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.datasets import ImageDataset
    from fourier_feature_nets_tpu.models import load_model
    from fourier_feature_nets_tpu.octree import OcTree
    from fourier_feature_nets_tpu.render import RaySampler, Raycaster
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )

    model_path, octree_path, scene_path = sys.argv[1:4]
    model, params = load_model(model_path)
    tree = OcTree.load(octree_path)
    dataset = ImageDataset.load(scene_path, "val", num_samples=128)
    cameras = dataset.cameras
    bounds = dataset.sampler.bounds
    caster = Raycaster(model, compute_dtype=jnp.bfloat16, fused=True)

    gt_rgb = load_val_gt(scene_path)

    def report(label, sampler):
        scores = []
        for cam in range(len(cameras)):
            image = caster.render_frame(params, sampler, cam)
            scores.append(psnr(np.asarray(image), gt_rgb[cam]))
        print(f"{label:38s}: "
              + " ".join(f"{s:6.2f}" for s in scores)
              + f"  mean {np.mean(scores):6.2f} dB")
        return np.mean(scores)

    brute = RaySampler(bounds, cameras, 128)
    base = report("brute force 128 samples", brute)
    ob = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)

    mean = report("uniform 32 samples",
                  RaySampler(bounds, cameras, 32))
    print(f"    quality cost vs brute force: {base - mean:+.3f} dB")

    for num in (48, 32, 24):
        dg = OccupancyGridSampler.from_model(model, params, cameras,
                                             num, bounds=ob)
        mean = report(f"density grid {num} samples + culling", dg)
        print(f"    quality cost vs brute force: "
              f"{base - mean:+.3f} dB")

    for num in (32,):
        occ = OccupancyGridSampler(tree, cameras, num,
                                   grid_resolution=64, num_probes=32,
                                   bounds=ob)
        mean = report(f"surface octree {num} samples + culling", occ)
        print(f"    quality cost vs brute force: "
              f"{base - mean:+.3f} dB")


if __name__ == "__main__":
    main()
