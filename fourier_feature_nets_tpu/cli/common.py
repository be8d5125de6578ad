"""Shared plumbing for the 3D training CLIs."""

import json
import os

import numpy as np

from ..datasets import ImageDataset, Mode
from ..models import load_model
from ..parallel import make_mesh
from ..visualizers import EvaluationVisualizer, OrbitVideoVisualizer


def add_common_train_args(parser):
    """Arguments shared by the voxel/tiny-NeRF/NeRF trainers."""
    parser.add_argument("--mode", choices=["rgba", "rgb", "dilate"],
                        default="rgba")
    parser.add_argument("--batch-size", type=int, default=1024)
    parser.add_argument("--report-interval", type=int, default=1000)
    parser.add_argument("--image-interval", type=int, default=2000)
    parser.add_argument("--seed", type=int, default=20080524)
    parser.add_argument("--make-video", action="store_true")
    parser.add_argument("--color-space", choices=["YCrCb", "RGB"],
                        default="RGB")
    parser.add_argument("--num-frames", type=int, default=200)
    parser.add_argument("--anneal-start", type=float, default=0.2)
    parser.add_argument("--num-anneal-steps", type=int, default=2000)
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard the ray batch across all devices")
    parser.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                        default="float32",
                        help="Matmul dtype for the model body")
    parser.add_argument("--fused", action="store_true", default=None,
                        help="Force the Pallas fused NeRF kernels for "
                             "rendering and training (default: auto — "
                             "ON for NeRF on TPU, where fused training "
                             "measured 1.8x over XLA autodiff)")
    parser.add_argument("--no-fused", dest="fused", action="store_false",
                        help="Force the XLA autodiff/render path")
    parser.add_argument("--steps-per-call", type=int, default=1,
                        help="Optimization steps per compiled call "
                             "(lax.scan); >1 amortizes dispatch "
                             "overhead on remote TPU runtimes")
    parser.add_argument("--checkpoint-interval", type=int, default=0,
                        help="Steps between resumable train-state "
                             "checkpoints (written asynchronously to "
                             "<results_dir>/checkpoints); 0 disables")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the newest checkpoint in "
                             "<results_dir>/checkpoints")
    parser.add_argument("--occupancy-interval", type=int, default=0,
                        help="Enable occupancy-guided training: "
                             "refresh a density grid from the live "
                             "model every N steps and sample "
                             "--occupancy-samples rays/step through "
                             "it (0 disables)")
    parser.add_argument("--occupancy-samples", type=int, default=48,
                        help="Samples/ray once occupancy-guided "
                             "training activates")
    parser.add_argument("--occupancy-start", type=int, default=0,
                        help="First occupancy-guided step (0: after "
                             "the crop curriculum, at least 1000)")
    parser.add_argument("--occupancy-end", type=int, default=0,
                        help="Restore full uniform sampling from this "
                             "step on (fine-tune tail; 0 keeps "
                             "occupancy until the end)")
    parser.add_argument("--occupancy-empty-weight", type=float,
                        default=0.1,
                        help="Relative sample mass kept in cells the "
                             "live-model grid marks empty (recovery "
                             "budget for threshold mistakes)")
    parser.add_argument("--occupancy-mix", type=int, default=0,
                        help="Full-sampling steps appended after each "
                             "guided chunk (anchors the field to the "
                             "uniform validation quadrature; 0 "
                             "disables)")


def fit_kwargs(args):
    """fit() checkpoint/resume/occupancy kwargs from the common CLI flags."""
    kwargs = {}
    if getattr(args, "occupancy_interval", 0):
        kwargs.update(
            occupancy_interval=args.occupancy_interval,
            occupancy_samples=args.occupancy_samples,
            occupancy_start=args.occupancy_start or None,
            occupancy_end=args.occupancy_end or None,
            occupancy_empty_weight=args.occupancy_empty_weight,
            occupancy_mix=args.occupancy_mix)
    if not (args.checkpoint_interval or args.resume):
        return kwargs
    directory = os.path.join(args.results_dir, "checkpoints")
    kwargs.update(checkpoint_dir=directory,
                  checkpoint_interval=args.checkpoint_interval or None,
                  resume=args.resume)
    return kwargs


def load_opacity(path, args):
    """Loads an optional opacity model checkpoint."""
    if not path:
        return None, None
    model, params = load_model(path)
    return model, params


def load_train_val(args, opacity_model=None, opacity_params=None,
                   num_samples=None):
    """Loads train (stratified) and val datasets per the reference CLIs."""
    include_alpha = args.mode == "rgba"
    num_samples = num_samples or args.num_samples
    train = ImageDataset.load(args.data_path, "train", num_samples,
                              include_alpha, True, opacity_model,
                              opacity_params, args.batch_size,
                              args.color_space,
                              anneal_start=args.anneal_start,
                              num_anneal_steps=args.num_anneal_steps)
    val = ImageDataset.load(args.data_path, "val", num_samples,
                            include_alpha, False, opacity_model,
                            opacity_params, args.batch_size,
                            args.color_space)
    if train is not None and args.mode == "dilate":
        train.mode = Mode.Dilate
    return train, val


def make_visualizers(args, train_dataset, val_dataset, num_samples=None):
    """Builds the per-run visualizers (train_voxels.py:74-95 pattern)."""
    num_samples = num_samples or args.num_samples
    if args.make_video:
        resolution = train_dataset.cameras[0].resolution
        return [OrbitVideoVisualizer(args.results_dir, args.num_steps,
                                     resolution, args.num_frames,
                                     num_samples, args.color_space)]
    if args.image_interval <= 0:
        # --image-interval 0 disables image artifacts entirely
        # (benchmark runs); an interval of 0 would otherwise divide
        # by zero inside the visualizer cadence check
        return []
    return [EvaluationVisualizer(args.results_dir, train_dataset,
                                 args.image_interval),
            EvaluationVisualizer(args.results_dir, val_dataset,
                                 args.image_interval)]


# Named serving/rendering presets (orbit_video + serve CLIs). Each is
# a measured point on the speed/quality frontier (docs/RESULTS.md
# § Distillation & serving presets); a preset only fills flags the
# user left at their parser default, so explicit flags always win.
# "fast" pairs naturally with a distilled student checkpoint
# (cli/distill_model.py) — the teacher-sized model works but leaves
# the speedup on the table.
# The recommended serving student shape (num_layers, num_channels):
# the measured frontier point that `--preset fast` pairs with
# (docs/RESULTS.md § Stacked serving preset / § MXU-aligned sweep).
# Single source of truth — `ffn-distill`'s default student and
# bench.py's student-frame metric both read it, so re-pointing the
# recommendation after a new sweep is a one-line change.
RECOMMENDED_STUDENT = (6, 192)

RENDER_PRESETS = {
    "fast": {
        # density-grid culling + the production 48-sample dose; early
        # termination measured NEUTRAL at 48 samples, kept off
        "density_grid": True,
        "num_samples": 48,
        "compute_dtype": "bfloat16",
    },
    "quality": {
        # 96 guided samples (the dose that BEATS 128-uniform
        # training quality) + early termination at its profitable
        # operating point (1.15x at eps=1e-2, K=48)
        "density_grid": True,
        "num_samples": 96,
        "early_term": 1e-2,
        "early_split": 48,
        "compute_dtype": "bfloat16",
    },
}


def add_preset_arg(parser):
    parser.add_argument("--preset", choices=sorted(RENDER_PRESETS),
                        help="Named render/serving configuration "
                             "(fills any flag you did not set "
                             "explicitly): 'fast' = density-grid "
                             "culling at 48 samples; 'quality' = 96 "
                             "samples + early termination. Measured "
                             "points in docs/RESULTS.md")


def apply_render_preset(args, parser, argv=None):
    """Fills preset values for flags the user did not pass.

    Presence is decided from ``argv`` (not by comparing against
    parser defaults — explicitly passing the default value must still
    beat the preset). Tokens are canonicalized against ``parser``'s
    option strings the same way argparse resolves them, so an
    abbreviated flag (``--num-sam 32``) still beats the preset."""
    import sys

    preset = getattr(args, "preset", None)
    if not preset:
        return args
    tokens = list(sys.argv[1:] if argv is None else argv)
    options = list(parser._option_string_actions)

    explicit = set()
    for tok in tokens:
        if tok == "--":
            # argparse treats everything after a bare -- as positional
            break
        if not tok.startswith("--"):
            continue
        stem = tok.split("=", 1)[0]
        if stem in options:
            explicit.add(stem)
            continue
        # argparse accepts any unambiguous prefix of a long option
        matches = [opt for opt in options if opt.startswith(stem)]
        if len(matches) == 1:
            explicit.add(matches[0])

    for name, value in RENDER_PRESETS[preset].items():
        if "--" + name.replace("_", "-") not in explicit:
            setattr(args, name, value)
    return args


def save_best_model(results_dir, name, model, log):
    """Writes ``<name>_best.npz`` — the report-interval snapshot with
    the highest val PSNR.

    Late NeRF training oscillates +/-2 dB between validation points
    (docs/RESULTS.md trajectories), so the FINAL weights routinely sit
    1-2 dB below the run's peak; serving/distillation want the peak.
    ``fit`` already snapshots params per report interval into
    LogEntry (the reference's in-memory pattern, ray_caster.py:359-362)
    — this persists the argmax-val entry next to the final model.
    """
    from ..models import save_model
    entries = [e for e in log if np.isfinite(e.val_psnr)]
    if not entries:
        return None
    best = max(entries, key=lambda e: e.val_psnr)
    path = os.path.join(results_dir, f"{name}_best.npz")
    save_model(model, best.state, path)
    print(f"best val checkpoint: step {best.step} "
          f"({best.val_psnr:.2f} dB) -> {path}")
    return path


def get_mesh(args):
    """Data-parallel mesh over all devices, or None."""
    return make_mesh() if args.data_parallel else None


def get_compute_dtype(args):
    import jax.numpy as jnp
    return jnp.bfloat16 if args.compute_dtype == "bfloat16" else None


def write_run_log(path, args, log):
    """JSON args header + TSV of LogEntry rows (train_voxels.py:111-119).

    The TSV body delegates to utils.progress.write_log so the format
    consumed by sweep.best_metric_from_log has exactly one producer.
    """
    from ..utils.progress import write_log

    with open(path, "w") as file:
        json.dump({k: v for k, v in vars(args).items()
                   if isinstance(v, (int, float, str, bool, type(None)))},
                  file)
        file.write("\n\n")
        write_log(file, log)


def resolve_data_path(path: str) -> str:
    """Resolves a dataset path; 'synthetic[:<res>]' generates the
    built-in synthetic scene (air-gapped replacement for downloads).
    A non-existent path is resolved against the data cache when a
    cached copy exists (where ``ImageDataset.load`` downloads to) so
    callers that ALSO open the NPZ directly read the same file."""
    parts = path.split(":")
    # exact match on the scheme: startswith would hijack real files
    # named e.g. synthetic_800.npz (same form as
    # train_image_regression.py:79)
    if parts[0] == "synthetic":
        from ..datasets.synthetic import load_or_generate
        from ..utils.assets import default_data_dir
        res = int(parts[1]) if len(parts) > 1 else 100
        out = os.path.join(default_data_dir(), f"synthetic_{res}.npz")
        return load_or_generate(out, resolution=res)
    if not os.path.exists(path):
        from ..utils.assets import default_data_dir
        cached = os.path.join(default_data_dir(),
                              os.path.basename(path))
        if os.path.exists(cached):
            return cached
    return path
