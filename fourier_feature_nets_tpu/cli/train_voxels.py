"""CLI: trains a voxelized volumetric representation from images.

TPU re-design of /root/reference/train_voxels.py.
"""

import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

import jax

from ..models import Voxels, save_model
from ..render import Raycaster
from . import common


def _parse_args(argv=None):
    parser = ArgumentParser("Voxel Training Script",
                            formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("data_path", help="Path to the data NPZ "
                        "(or 'synthetic[:res]')")
    parser.add_argument("side", type=int, help="Voxels per volume side")
    parser.add_argument("results_dir", help="Path to output results")
    parser.add_argument("--num-samples", type=int, default=256)
    parser.add_argument("--learning-rate", type=float, default=0.01)
    parser.add_argument("--num-steps", type=int, default=10000)
    parser.add_argument("--decay-rate", type=float, default=0.9)
    parser.add_argument("--decay-steps", type=int, default=25000)
    parser.add_argument("--factorized-rank", type=int, default=0,
                        help="Rank > 0 trains a TensoRF-VM factorized "
                             "voxel field (matmul-bound: no gather/"
                             "scatter, ~6x faster steps on TPU) "
                             "instead of the dense grid")
    common.add_common_train_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    args = _parse_args(argv)
    args.data_path = common.resolve_data_path(args.data_path)
    os.makedirs(args.results_dir, exist_ok=True)

    train_dataset, val_dataset = common.load_train_val(args)
    if train_dataset is None:
        return 1

    visualizers = common.make_visualizers(args, train_dataset, val_dataset)

    # The voxel cube must span the render volume, so scale (the
    # half-extent positions are divided by) = bounds[0,0] / 2. The
    # reference computes 2 / bounds[0,0] (train_voxels.py:100), which
    # coincides for its bounds[0,0] == 2 datasets but inverts for any
    # other volume size — we use the geometrically correct form.
    scale = float(train_dataset.sampler.bounds[0, 0]) / 2.0
    if args.factorized_rank > 0:
        from ..models import FactorizedVoxels
        model = FactorizedVoxels(args.side, scale,
                                 rank=args.factorized_rank)
    else:
        model = Voxels(args.side, scale)
    params = model.init(jax.random.PRNGKey(args.seed))
    raycaster = Raycaster(model,
                          compute_dtype=common.get_compute_dtype(args),
                          fused=args.fused, fused_train=args.fused)

    params, log = raycaster.fit(params, train_dataset, val_dataset,
                                args.batch_size, args.learning_rate,
                                args.num_steps, 0, args.report_interval,
                                args.decay_rate, args.decay_steps, 0.0,
                                visualizers, mesh=common.get_mesh(args),
                                seed=args.seed,
                                steps_per_call=args.steps_per_call,
                                **common.fit_kwargs(args))

    save_model(model, params, os.path.join(args.results_dir, "voxels.npz"))
    common.save_best_model(args.results_dir, "voxels", model, log)
    common.write_run_log(os.path.join(args.results_dir, "log.txt"),
                         args, log)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
