"""Distilled-student evaluation: quality + serving speed vs teacher.

Renders the scene's VAL cameras (novel views) with the teacher and the
distilled student and reports dataset-GT PSNR (brute-force 128 uniform
protocol and the production density-grid dose), student-vs-teacher
render fidelity, and the end-to-end 800px orbit frame time for both
(pipelined best-of rounds, the serving metric).

Usage:
  python -m tools.distill_eval <teacher.npz> <student.npz> <scene.npz> \
      [prod_samples=48]
"""

import sys

import numpy as np

from tools._eval_common import (
    load_val_gt,
    pipelined_frame_seconds,
    psnr,
)


def main():
    import jax.numpy as jnp

    from fourier_feature_nets_tpu.cameras import Resolution
    from fourier_feature_nets_tpu.datasets import ImageDataset
    from fourier_feature_nets_tpu.models import load_model
    from fourier_feature_nets_tpu.render import RaySampler, Raycaster
    from fourier_feature_nets_tpu.render.occupancy_sampler import (
        OccupancyGridSampler,
    )
    from fourier_feature_nets_tpu.utils.camera_paths import orbit

    teacher_path, student_path, scene_path = sys.argv[1:4]
    prod_samples = int(sys.argv[4]) if len(sys.argv) > 4 else 48

    dataset = ImageDataset.load(scene_path, "val", num_samples=128)
    cameras = dataset.cameras
    bounds = dataset.sampler.bounds
    gt_rgb = load_val_gt(scene_path)

    ob = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    res = dataset.sampler.image_width
    orbit_cams = orbit(np.array([0.0, 1.0, 0.0]),
                       np.array([0.0, 0.0, -1.0]), 12, 40.0,
                       Resolution(res, res), 4.0)

    renders = {}

    def evaluate(label, path):
        model, params = load_model(path)
        manifest = model.params_manifest
        print(f"{label}: {manifest.get('num_layers')}x"
              f"{manifest.get('num_channels')} ({path})")
        caster = Raycaster(model, compute_dtype=jnp.bfloat16,
                           fused=True)

        brute = RaySampler(bounds, cameras, 128)
        scores = [psnr(np.asarray(
            caster.render_frame(params, brute, cam)), gt_rgb[cam])
            for cam in range(len(cameras))]
        print(f"  val PSNR (128 uniform):      "
              f"{np.mean(scores):6.2f} dB")

        dg = OccupancyGridSampler.from_model(model, params, cameras,
                                             prod_samples, bounds=ob)
        frames = [np.asarray(caster.render_frame(params, dg, cam))
                  for cam in range(len(cameras))]
        renders[label] = frames
        scores = [psnr(f, gt_rgb[cam])
                  for cam, f in enumerate(frames)]
        print(f"  val PSNR (density-grid {prod_samples}): "
              f"{np.mean(scores):6.2f} dB")

        # serving speed: pipelined orbit frames, best of 3 rounds
        sampler = OccupancyGridSampler.from_model(
            model, params, orbit_cams, prod_samples, bounds=ob,
            grid_resolution=64, num_probes=32)
        best = pipelined_frame_seconds(
            lambda frame: caster.render_frame_async(params, sampler,
                                                    frame))
        print(f"  orbit frame ({res}px, {prod_samples} smp): "
              f"{best * 1e3:6.1f} ms ({1.0 / best:.2f} FPS/chip)")
        return best

    t_best = evaluate("teacher", teacher_path)
    s_best = evaluate("student", student_path)
    fidelity = [psnr(s, t) for s, t in zip(renders["student"],
                                           renders["teacher"])]
    print(f"student-vs-teacher render fidelity: "
          f"{np.mean(fidelity):6.2f} dB")
    print(f"speedup: {t_best / s_best:.2f}x")


if __name__ == "__main__":
    main()
