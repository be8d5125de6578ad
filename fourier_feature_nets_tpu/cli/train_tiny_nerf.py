"""CLI: trains a Tiny NeRF model (position-only radiance field).

TPU re-design of /root/reference/train_tiny_nerf.py: a 3->4
FourierFeatureMLP variant trained through the raycaster, optionally
with hierarchical (opacity-model-guided) sampling.
"""

import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser

import jax

from ..models import (
    BasicFourierMLP,
    GaussianFourierMLP,
    MLP,
    PositionalFourierMLP,
    save_model,
)
from ..render import Raycaster
from ..visualizers import ActivationVisualizer
from . import common


def _parse_args(argv=None):
    parser = ArgumentParser("Tiny NeRF Training Script",
                            formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("data_path", help="Path to the data NPZ "
                        "(or 'synthetic[:res]')")
    parser.add_argument("nerf_model", choices=["mlp", "basic",
                                               "positional", "gaussian"])
    parser.add_argument("results_dir", help="Path to output results")
    parser.add_argument("--opacity-model")
    parser.add_argument("--num-samples", type=int, default=128)
    parser.add_argument("--learning-rate", type=float, default=5e-4)
    parser.add_argument("--num-channels", type=int, default=256)
    parser.add_argument("--embedding-size", type=int, default=256)
    parser.add_argument("--pos-max-log-scale", type=float, default=5.5)
    parser.add_argument("--gauss-sigma", type=float, default=6.05)
    parser.add_argument("--num-steps", type=int, default=50000)
    parser.add_argument("--crop-steps", type=int, default=1000)
    parser.add_argument("--decay-rate", type=float, default=0.1)
    parser.add_argument("--decay-steps", type=int, default=25000)
    parser.add_argument("--weight-decay", type=float, default=0)
    parser.add_argument("--make-activations", action="store_true")
    common.add_common_train_args(parser)
    return parser.parse_args(argv)


def build_model(args, rng):
    """Builds the 3->4 FFN variant (train_tiny_nerf.py:75-88)."""
    if args.nerf_model == "mlp":
        return MLP(3, 4, num_channels=args.num_channels)
    if args.nerf_model == "basic":
        return BasicFourierMLP(3, 4, num_channels=args.num_channels)
    if args.nerf_model == "positional":
        return PositionalFourierMLP(3, 4,
                                    max_log_scale=args.pos_max_log_scale,
                                    num_channels=args.num_channels,
                                    embedding_size=args.embedding_size)
    if args.nerf_model == "gaussian":
        return GaussianFourierMLP(3, 4, sigma=args.gauss_sigma,
                                  num_channels=args.num_channels,
                                  embedding_size=args.embedding_size,
                                  rng=rng)
    raise NotImplementedError(args.nerf_model)


def main(argv=None):
    args = _parse_args(argv)
    args.data_path = common.resolve_data_path(args.data_path)
    os.makedirs(args.results_dir, exist_ok=True)

    rng = jax.random.PRNGKey(args.seed)
    model_rng, init_rng = jax.random.split(rng)
    model = build_model(args, model_rng)
    params = model.init(init_rng)

    opacity_model, opacity_params = common.load_opacity(
        args.opacity_model, args)
    train_dataset, val_dataset = common.load_train_val(
        args, opacity_model, opacity_params)
    if train_dataset is None:
        return 1

    visualizers = common.make_visualizers(args, train_dataset, val_dataset)
    if args.make_activations:
        resolution = train_dataset.cameras[0].resolution
        visualizers.append(ActivationVisualizer(
            args.results_dir, args.num_steps, resolution,
            args.num_frames, args.num_samples, args.color_space))

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

    save_model(model, params,
               os.path.join(args.results_dir, "tiny_nerf.npz"))
    common.save_best_model(args.results_dir, "tiny_nerf", model, log)
    common.write_run_log(os.path.join(args.results_dir, "log.txt"),
                         args, log)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
