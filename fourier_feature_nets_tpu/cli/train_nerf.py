"""CLI: trains a full NeRF model.

TPU re-design of /root/reference/train_nerf.py: the full
view-dependent NeRF (8x256, skips=[4]) trained end-to-end in one
jitted step, optionally data-parallel across a device mesh.
"""

import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

import jax

from ..models import NeRF, save_model
from ..render import Raycaster
from . import common


def _parse_args(argv=None):
    parser = ArgumentParser("NeRF Training script",
                            formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("data_path", help="Path to the data NPZ "
                        "(or 'synthetic[:res]')")
    parser.add_argument("results_dir", help="Path to output results")
    parser.add_argument("--opacity-model")
    parser.add_argument("--num-samples", type=int, default=128)
    parser.add_argument("--num-layers", type=int, default=8)
    parser.add_argument("--learning-rate", type=float, default=5e-4)
    parser.add_argument("--num-channels", type=int, default=256)
    parser.add_argument("--pos-freq", type=int, default=10)
    parser.add_argument("--pos-max-log-scale", type=float, default=9)
    parser.add_argument("--view-freq", type=int, default=4)
    parser.add_argument("--view-max-log-scale", type=float, default=3)
    parser.add_argument("--num-steps", type=int, default=50000)
    parser.add_argument("--crop-steps", type=int, default=1000)
    parser.add_argument("--omit-inputs", action="store_true")
    parser.add_argument("--decay-rate", type=float, default=0.1)
    parser.add_argument("--decay-steps", type=int, default=250000)
    parser.add_argument("--weight-decay", type=float, default=0)
    common.add_common_train_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = _parse_args(argv)
    args.data_path = common.resolve_data_path(args.data_path)
    os.makedirs(args.results_dir, exist_ok=True)

    model = NeRF(args.num_layers, args.num_channels,
                 args.pos_max_log_scale, args.pos_freq,
                 args.view_max_log_scale, args.view_freq,
                 [4], not args.omit_inputs)
    params = model.init(jax.random.PRNGKey(args.seed))

    opacity_model, opacity_params = common.load_opacity(
        args.opacity_model, args)
    train_dataset, val_dataset = common.load_train_val(
        args, opacity_model, opacity_params)
    if train_dataset is None:
        return 1

    visualizers = common.make_visualizers(args, train_dataset, val_dataset)
    raycaster = Raycaster(model,
                          compute_dtype=common.get_compute_dtype(args),
                          fused=args.fused, fused_train=args.fused)
    params, log = raycaster.fit(params, train_dataset, val_dataset,
                                args.batch_size, args.learning_rate,
                                args.num_steps, args.crop_steps,
                                args.report_interval, args.decay_rate,
                                args.decay_steps, args.weight_decay,
                                visualizers, mesh=common.get_mesh(args),
                                seed=args.seed,
                                steps_per_call=args.steps_per_call,
                                **common.fit_kwargs(args))

    save_model(model, params, os.path.join(args.results_dir, "nerf.npz"))
    common.save_best_model(args.results_dir, "nerf", model, log)
    common.write_run_log(os.path.join(args.results_dir, "log.txt"),
                         args, log)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
