"""One-command reference-vs-framework parity harness.

Given a dataset — a packaged asset name (``lego_400``, ``antinous_400``,
... from the ASSETS registry, downloaded on demand when egress exists),
a local NPZ path, or ``synthetic[:res]`` (egress-free dry mode) — this
runs the PyTorch reference trainer (/root/reference via
tools/ref_runner.py + ref_stubs) and this framework's matching CLI at
MATCHED budgets, parses both run logs (identical TSV schema:
train_voxels.py:111-119 and cli.common.write_run_log), and emits the
docs/RESULTS.md-style trajectory table plus time/step.

The flag names are shared between the two CLI families by design, so
the harness passes one budget through to both. The reference always
runs on CPU (no CUDA here); ours runs wherever JAX dispatches (TPU if
up) unless ``--ours-cpu``.

Usage:
  python -m tools.real_parity --dataset synthetic:100 --trainer voxels \
      --num-steps 2000 --num-samples 64 [--side 128]
  python -m tools.real_parity --dataset lego_400 --trainer nerf \
      --num-steps 50000            # needs network egress for download

Reference anchors: utils.py:100-176 (ASSETS registry), README.md:130-141
(NPZ schema), train_voxels.py / train_tiny_nerf.py / train_nerf.py
(the budgets being matched).
"""

import argparse
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", required=True,
                        help="asset name (lego_400, ...), NPZ path, or "
                             "synthetic[:res]")
    parser.add_argument("--trainer", required=True,
                        choices=["voxels", "tiny_nerf", "nerf"])
    parser.add_argument("--out", default="/tmp/real_parity",
                        help="work/results directory")
    parser.add_argument("--num-steps", type=int, default=2000)
    parser.add_argument("--batch-size", type=int, default=1024)
    parser.add_argument("--num-samples", type=int, default=64)
    parser.add_argument("--report-interval", type=int, default=500)
    parser.add_argument("--seed", type=int, default=20080524)
    parser.add_argument("--side", type=int, default=128,
                        help="voxels: grid side")
    parser.add_argument("--variant", default="positional",
                        help="tiny_nerf: mlp/basic/positional/gaussian")
    parser.add_argument("--num-channels", type=int, default=0,
                        help="0 = the trainer's default")
    parser.add_argument("--crop-steps", type=int, default=-1,
                        help="-1 = the trainer's default")
    parser.add_argument("--skip-reference", action="store_true",
                        help="only run the framework side")
    parser.add_argument("--ours-cpu", action="store_true",
                        help="pin the framework run to CPU for a "
                             "same-machine comparison")
    parser.add_argument("--timeout", type=float, default=0.0,
                        help="per-run wall limit in seconds (0 = none)")
    return parser.parse_args(argv)


def resolve_dataset(spec: str) -> str:
    """Asset name / NPZ path / synthetic[:res] -> a local NPZ path."""
    if os.path.exists(spec):
        return os.path.abspath(spec)
    if spec.split(":")[0] == "synthetic":
        # dedicated parity scene with 16 train / 12 val cameras (the
        # packaged datasets' shape). The camera counts matter: the
        # reference's _validate crashes on any dataset under 102,401
        # rays in Full mode (ray_caster.py:228-232 takes the
        # np.arange branch whose array reaches to_valid unlisted —
        # `[i for i in [array] if i not in set]` is unhashable), so
        # val must have > 102400/res^2 cameras for the reference side
        # to run at all. Do not replicate the bug; route around it.
        from fourier_feature_nets_tpu.datasets.synthetic import (
            load_or_generate,
        )
        from fourier_feature_nets_tpu.utils.assets import (
            default_data_dir,
        )
        parts = spec.split(":")
        res = int(parts[1]) if len(parts) > 1 else 100
        path = os.path.join(default_data_dir(),
                            f"synthetic_parity_{res}.npz")
        return load_or_generate(path, resolution=res,
                                split_counts=(16, 12, 4))

    from fourier_feature_nets_tpu.utils.assets import (
        ASSETS,
        default_data_dir,
        download_asset,
    )
    if spec not in ASSETS:
        raise SystemExit(
            f"unknown dataset {spec!r}: not a file, not synthetic[:res] "
            f"and not in the ASSETS registry ({sorted(ASSETS)[:8]}...)")
    path = os.path.join(default_data_dir(), f"{spec}.npz")
    if not os.path.exists(path):
        print(f"downloading asset {spec} -> {path}")
        if not download_asset(spec, path):
            raise SystemExit(
                f"download of {spec!r} failed (no network egress?); "
                "run with --dataset synthetic:<res> for the dry mode")
    return path


def budget_args(args):
    """The shared flag set both CLI families accept verbatim."""
    shared = ["--num-steps", str(args.num_steps),
              "--batch-size", str(args.batch_size),
              "--num-samples", str(args.num_samples),
              "--report-interval", str(args.report_interval),
              "--image-interval", str(10 * args.num_steps),
              "--seed", str(args.seed)]
    if args.crop_steps >= 0 and args.trainer != "voxels":
        shared += ["--crop-steps", str(args.crop_steps)]
    if args.num_channels and args.trainer != "voxels":
        shared += ["--num-channels", str(args.num_channels)]
    return shared


def positional_args(args, data_path, results_dir):
    if args.trainer == "voxels":
        return [data_path, str(args.side), results_dir]
    if args.trainer == "tiny_nerf":
        return [data_path, args.variant, results_dir]
    return [data_path, results_dir]


def run(cmd, env, timeout, label):
    print(f"[{label}] {' '.join(cmd)}")
    start = time.perf_counter()
    proc = subprocess.run(cmd, env=env, cwd=REPO,
                          timeout=timeout or None)
    wall = time.perf_counter() - start
    if proc.returncode != 0:
        raise SystemExit(f"{label} run failed (exit {proc.returncode})")
    print(f"[{label}] wall: {wall / 60:.2f} min")
    return wall


def parse_log(path):
    """TSV rows (step, timestamp, psnr_train, psnr_val) from a run log
    (tolerates the reference train_nerf quirk of a header ending in a
    tab instead of a newline)."""
    rows = []
    pattern = re.compile(
        r"(\d+)\t([0-9.eE+-]+)\t([0-9.eEnainf+-]+)\t([0-9.eEnainf+-]+)")
    with open(path) as file:
        for match in pattern.finditer(file.read()):
            rows.append((int(match.group(1)), float(match.group(2)),
                         float(match.group(3)), float(match.group(4))))
    return rows


def main(argv=None):
    args = parse_args(argv)
    data_path = resolve_dataset(args.dataset)
    os.makedirs(args.out, exist_ok=True)
    print(f"dataset: {data_path}")

    script = {"voxels": "train_voxels.py",
              "tiny_nerf": "train_tiny_nerf.py",
              "nerf": "train_nerf.py"}[args.trainer]
    module = {"voxels": "train_voxels", "tiny_nerf": "train_tiny_nerf",
              "nerf": "train_nerf"}[args.trainer]

    results = {}
    walls = {}

    if not args.skip_reference:
        ref_dir = os.path.join(args.out, "reference")
        os.makedirs(ref_dir, exist_ok=True)
        env = dict(os.environ)
        env["PYTHONPATH"] = f"{REFERENCE}:{REPO}/tools/ref_stubs"
        env.pop("PALLAS_AXON_POOL_IPS", None)  # torch-only subprocess
        cmd = ([sys.executable, os.path.join(REPO, "tools/ref_runner.py"),
                os.path.join(REFERENCE, script)]
               + positional_args(args, data_path, ref_dir)
               + budget_args(args) + ["--device", "cpu"])
        walls["reference"] = run(cmd, env, args.timeout, "reference")
        results["reference"] = parse_log(os.path.join(ref_dir, "log.txt"))

    ours_dir = os.path.join(args.out, "ours")
    os.makedirs(ours_dir, exist_ok=True)
    env = dict(os.environ)
    if args.ours_cpu:
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
    cmd = ([sys.executable, "-u", "-m",
            f"fourier_feature_nets_tpu.cli.{module}"]
           + positional_args(args, data_path, ours_dir)
           + budget_args(args))
    walls["ours"] = run(cmd, env, args.timeout, "ours")
    results["ours"] = parse_log(os.path.join(ours_dir, "log.txt"))

    # ---- the RESULTS.md trajectory table ----
    print(f"\n## {args.trainer} on {args.dataset} "
          f"({args.num_steps} steps, batch {args.batch_size}, "
          f"{args.num_samples} samples/ray)\n")
    if "reference" in results:
        ref = dict((s, v) for s, _, _, v in results["reference"])
        ours = dict((s, v) for s, _, _, v in results["ours"])
        print("| step | reference val PSNR | ours val PSNR | delta |")
        print("|---|---|---|---|")
        for step in sorted(set(ref) & set(ours)):
            print(f"| {step} | {ref[step]:.3f} | {ours[step]:.3f} | "
                  f"{ours[step] - ref[step]:+.2f} |")
        steps = args.num_steps
        print(f"\ntime/step: reference {walls['reference'] / steps:.4f} s"
              f" — ours {walls['ours'] / steps:.4f} s "
              f"({walls['reference'] / max(walls['ours'], 1e-9):.1f}x)")
    else:
        print("| step | ours train PSNR | ours val PSNR |")
        print("|---|---|---|")
        for step, _, tr, va in results["ours"]:
            print(f"| {step} | {tr:.3f} | {va:.3f} |")
        print(f"\nwall: {walls['ours'] / 60:.2f} min")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
