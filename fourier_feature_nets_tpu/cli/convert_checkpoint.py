"""Checkpoint converter: native NPZ <-> reference PyTorch ``.pt``.

The reference stores models as torch state dicts
(fourier_feature_models.py:80-89, nerf_model.py:126-135,
voxels_model.py:47-56) and loads them with utils.py:448-503; this
framework stores self-describing NPZ. ``load_model`` already accepts
both formats, so conversion is just load + save in the requested
direction — reference users can bring their checkpoints here, and
models trained here can be exported back into the reference's
rendering/visualization scripts.

Usage:
    python -m fourier_feature_nets_tpu.cli.convert_checkpoint \
        input.{npz|pt} output.{npz|pt}
"""

import argparse

from ..models import load_model, save_model, save_torch_model


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description=__doc__.split("\n")[0],
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("input",
                        help="checkpoint to read (.npz, .pt or .pth)")
    parser.add_argument("output",
                        help="checkpoint to write (.npz, .pt or .pth)")
    return parser


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    model, params = load_model(args.input)
    if args.output.endswith((".pt", ".pth")):
        save_torch_model(model, params, args.output)
    else:
        save_model(model, params, args.output)
    print(f"{args.input} -> {args.output} ({model.model_type})")


if __name__ == "__main__":
    main()
