"""CLI: bakes a trained model into a smaller serving student.

Point-space teacher->student distillation (render/distill.py): no
dataset required — a hemisphere camera rig (utils.py:370-419 rig
semantics) plus the teacher's own density field supervise the student
along render-distribution rays. Optionally evaluates the student (and
teacher) against a dataset's val cameras with the reference's
128-sample uniform protocol.

Typical use (flagship 8x256 checkpoint -> 4x128 server model):

    python distill_model.py flagship.npz out/ \
        --num-steps 20000 --data scene_800.npz
    python serve_model.py out/student.npz 800 --density-grid
"""

import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

import numpy as np

from ..cameras import Resolution
from ..models import NeRF, load_model, save_model
from ..render import (
    OccupancyGridSampler,
    Raycaster,
    RaySampler,
    distill,
)
from ..utils import ETABar, hemisphere
from .orbit_video import VECTORS


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(
        "Model Distillation (baking for serving)",
        formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("teacher_path",
                        help="Trained teacher checkpoint (.npz or .pt)")
    parser.add_argument("results_dir")
    from .common import RECOMMENDED_STUDENT
    parser.add_argument("--student-layers", type=int,
                        default=RECOMMENDED_STUDENT[0],
                        help="Student depth (default: the recommended "
                             "serving shape, cli/common.py)")
    parser.add_argument("--student-channels", type=int,
                        default=RECOMMENDED_STUDENT[1])
    parser.add_argument("--student-freq-pos", type=int, default=10)
    parser.add_argument("--student-freq-view", type=int, default=4)
    parser.add_argument("--num-steps", type=int, default=20000)
    parser.add_argument("--batch-rays", type=int, default=1024)
    parser.add_argument("--num-samples", type=int, default=128,
                        help="Supervision samples per ray")
    parser.add_argument("--learning-rate", type=float, default=5e-4)
    parser.add_argument("--decay-rate", type=float, default=1.0,
                        help="Exponential LR decay factor (applied "
                             "over --decay-steps); 1.0 disables")
    parser.add_argument("--decay-steps", type=int, default=0)
    parser.add_argument("--seed", type=int, default=20080524)
    parser.add_argument("--steps-per-call", type=int, default=100)
    parser.add_argument("--report-interval", type=int, default=1000)
    parser.add_argument("--num-cameras", type=int, default=64,
                        help="Hemisphere supervision rig size")
    parser.add_argument("--resolution", type=int, default=400,
                        help="Supervision rig image resolution")
    parser.add_argument("--distance", type=float, default=4.0)
    parser.add_argument("--fov-y-degrees", type=float, default=40.0)
    parser.add_argument("--up-dir", default="y+", choices=sorted(VECTORS))
    parser.add_argument("--forward-dir", default="z-",
                        choices=sorted(VECTORS))
    parser.add_argument("--scale", type=float, default=2.0,
                        help="Render-volume bounds diagonal; the cube "
                             "half extent is scale/2 (overridden by "
                             "--data bounds)")
    parser.add_argument("--uniform", action="store_true",
                        help="Uniform sample placement instead of the "
                             "teacher's density-grid occupancy CDF")
    parser.add_argument("--occupancy-resolution", type=int, default=64)
    parser.add_argument("--density-threshold", type=float, default=1e-3)
    parser.add_argument("--data",
                        help="Optional dataset NPZ: supervise with its "
                             "TRAIN cameras and report student/teacher "
                             "val PSNR (reference 128-sample protocol)")
    parser.add_argument("--eval-teacher", action="store_true",
                        help="Also evaluate the teacher on the val "
                             "cameras (the distillation ceiling)")
    parser.add_argument("--fused", action="store_true", default=None)
    parser.add_argument("--no-fused", dest="fused", action="store_false")
    parser.add_argument("--checkpoint-interval", type=int, default=0,
                        help="Steps between resumable train-state "
                             "checkpoints (async, to "
                             "<results_dir>/checkpoints); 0 disables")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the newest checkpoint in "
                             "<results_dir>/checkpoints (exact: "
                             "absolute-step RNG + restored Adam state)")
    return parser


def _val_psnr(model, params, cameras, bounds, gt_rgb,
              num_samples: int = 128, fused=None) -> float:
    """Reference eval protocol: uniform samples, whole-frame render.

    ``fused`` forwards the CLI's --fused/--no-fused so the PSNR is
    measured on the same forward path the user selected (auto-default
    otherwise re-enables the fused kernel on TPU even under
    --no-fused).
    """
    import jax.numpy as jnp

    from ..ops import psnr_from_mse

    caster = Raycaster(model, compute_dtype=jnp.bfloat16, fused=fused)
    sampler = RaySampler(bounds, cameras, num_samples)
    scores = []
    for cam in range(len(cameras)):
        image = np.asarray(
            caster.render_frame(params, sampler, cam,
                                cull_empty=False))
        mse = np.mean(np.square(image.astype(np.float32) / 255.0
                                - gt_rgb[cam].astype(np.float32) / 255.0))
        scores.append(float(psnr_from_mse(max(mse, 1e-10))))
    return float(np.mean(scores))


def main(argv=None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.decay_rate != 1.0 and args.decay_steps <= 0:
        parser.error("--decay-rate has no effect without "
                     "--decay-steps > 0 (the schedule is "
                     "lr * decay_rate ** (step / decay_steps)); "
                     "e.g. --decay-steps equal to --num-steps")
    os.makedirs(args.results_dir, exist_ok=True)

    teacher, teacher_params = load_model(args.teacher_path)

    gt_rgb = val_cameras = None
    if args.data:
        from ..datasets import ImageDataset
        from .common import resolve_data_path

        # resolve once: ImageDataset.load resolves synthetic:/cache/
        # download names internally, but the raw GT np.load below
        # needs the RESOLVED path (the original name may not exist on
        # disk at all)
        data_path = resolve_data_path(args.data)
        train_set = ImageDataset.load(data_path, "train",
                                      num_samples=args.num_samples)
        val_set = ImageDataset.load(data_path, "val",
                                    num_samples=args.num_samples)
        if train_set is None or val_set is None:
            # load() prints the download failure; mirror
            # voxelize_model's clean exit instead of an AttributeError
            return 1
        cameras = train_set.cameras
        bounds = np.asarray(train_set.sampler.bounds, np.float32)
        val_cameras = val_set.cameras
        # re-resolve: ImageDataset.load may have just downloaded the
        # file into the cache
        data = np.load(resolve_data_path(data_path))
        train_count = int(data["split_counts"][0])
        val_count = int(data["split_counts"][1])
        gt = data["images"][train_count:train_count + val_count]
        if gt.shape[-1] == 4:
            gt_rgb = (gt[..., :3].astype(np.float32)
                      * (gt[..., 3:4].astype(np.float32) / 255.0)
                      ).astype(np.uint8)
        else:
            # RGB-only datasets are valid NPZ schema
            # (image_dataset.py:384); nothing to premultiply
            gt_rgb = gt[..., :3]
    else:
        rig_res = Resolution(args.resolution, args.resolution)
        cameras = hemisphere(
            VECTORS[args.up_dir], VECTORS[args.forward_dir],
            args.num_cameras, args.fov_y_degrees, rig_res,
            args.distance,
            rng=np.random.default_rng(args.seed))
        bounds = np.diag([args.scale] * 3 + [1.0]).astype(np.float32)

    if args.uniform or teacher.model_type != "nerf":
        sampler = RaySampler(bounds, cameras, args.num_samples,
                             stratified=True)
    else:
        sampler = OccupancyGridSampler.from_model(
            teacher, teacher_params, cameras, args.num_samples,
            stratified=True,
            grid_resolution=args.occupancy_resolution,
            alpha_threshold=args.density_threshold,
            # half extent, NOT the bounds diagonal: the cube spans
            # bounds @ [+-0.5, ..., 1] (raycaster.fit uses
            # bounds_max[0] the same way) — the full diagonal would
            # build the density grid over twice the volume per axis,
            # wasting 7/8 of the cells
            scale=float(bounds[0, 0]) / 2.0, bounds=bounds)

    student = NeRF(num_layers=args.student_layers,
                   num_channels=args.student_channels,
                   max_log_scale_pos=9.0,
                   num_freq_pos=args.student_freq_pos,
                   max_log_scale_view=3.0,
                   num_freq_view=args.student_freq_view,
                   skips=[args.student_layers // 2],
                   include_inputs=True)

    bar = ETABar("Distilling", max=args.num_steps)
    log = []
    last_step = [0]

    def reporter(step, loss):
        bar.next(step - last_step[0])
        last_step[0] = step
        bar.info(f"loss {loss:.3e}")
        log.append((step, loss))

    student_params, losses = distill(
        teacher, teacher_params, student, sampler,
        num_steps=args.num_steps,
        batch_rays=args.batch_rays,
        learning_rate=args.learning_rate,
        decay_rate=args.decay_rate,
        decay_steps=args.decay_steps,
        seed=args.seed,
        steps_per_call=args.steps_per_call,
        fused_teacher=args.fused,
        fused_student=args.fused,
        report_interval=args.report_interval,
        reporter=reporter,
        checkpoint_dir=(os.path.join(args.results_dir, "checkpoints")
                        if args.checkpoint_interval or args.resume
                        else None),
        checkpoint_interval=args.checkpoint_interval or None,
        resume=args.resume)
    bar.finish()

    out_path = os.path.join(args.results_dir, "student.npz")
    save_model(student, student_params, out_path)
    with open(os.path.join(args.results_dir, "distill_log.txt"),
              "w") as stream:
        stream.write("step\tloss\n")
        for step, loss in log:
            stream.write(f"{step}\t{loss:.6e}\n")
    print(f"student ({args.student_layers}x{args.student_channels}) "
          f"-> {out_path}  final loss {losses[-1]:.3e}")

    if gt_rgb is not None:
        psnr_s = _val_psnr(student, student_params, val_cameras,
                           bounds, gt_rgb, fused=args.fused)
        print(f"student val PSNR: {psnr_s:.2f} dB "
              "(128-sample uniform protocol)")
        if args.eval_teacher:
            psnr_t = _val_psnr(teacher, teacher_params, val_cameras,
                               bounds, gt_rgb, fused=args.fused)
            print(f"teacher val PSNR: {psnr_t:.2f} dB "
                  f"(distillation cost {psnr_t - psnr_s:+.2f} dB)")


if __name__ == "__main__":
    main()
