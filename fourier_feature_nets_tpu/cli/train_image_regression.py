"""CLI: 2-D image regression.

TPU re-design of /root/reference/train_image_regression.py: the
full-batch step (sigmoid + 0.5*MSE + Adam with per-step exponential
decay) is one jitted device function; the step counter is a traced
scalar so the LR schedule compiles into the step.
"""

import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets.pixel_dataset import PixelDataset
from ..models import (
    BasicFourierMLP,
    GaussianFourierMLP,
    MLP,
    PositionalFourierMLP,
    save_model,
)
from ..utils import adam_init, adam_update, exponential_lr


def _parse_args(argv=None):
    parser = ArgumentParser("NeRF2D Image Trainer",
                            formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("image_path", help="Path to an image file")
    parser.add_argument("nerf_model", choices=["mlp", "basic",
                                               "positional", "gaussian"])
    parser.add_argument("results_dir")
    parser.add_argument("--activations", action="store_true")
    parser.add_argument("--vertical", action="store_true")
    parser.add_argument("--omit-gt", action="store_true")
    parser.add_argument("--image-size", type=int, default=512)
    parser.add_argument("--color-space", choices=["YCrCb", "RGB"],
                        default="RGB")
    parser.add_argument("--num-channels", type=int, default=256)
    parser.add_argument("--embedding-size", type=int, default=256)
    parser.add_argument("--pos-max-log-scale", type=float, default=6)
    parser.add_argument("--gauss-sigma", type=float, default=10)
    parser.add_argument("--num-steps", type=int, default=2000)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--report-interval", type=int, default=50)
    parser.add_argument("--make-video", action="store_true")
    parser.add_argument("--decay-rate", type=float, default=0.1)
    parser.add_argument("--decay-steps", type=int, default=2500)
    parser.add_argument("--seed", type=int, default=20080524)
    return parser.parse_args(argv)


def build_model(name: str, args, rng=None):
    """Builds one of the four FFN variants (train_image_regression.py:85-98)."""
    if name == "mlp":
        return MLP(2, 3, num_channels=args.num_channels)
    if name == "basic":
        return BasicFourierMLP(2, 3, num_channels=args.num_channels)
    if name == "positional":
        return PositionalFourierMLP(2, 3,
                                    max_log_scale=args.pos_max_log_scale,
                                    num_channels=args.num_channels,
                                    embedding_size=args.embedding_size)
    if name == "gaussian":
        return GaussianFourierMLP(2, 3, sigma=args.gauss_sigma,
                                  num_channels=args.num_channels,
                                  embedding_size=args.embedding_size,
                                  rng=rng)
    raise NotImplementedError(f"Unsupported model: {name}")


def main(argv=None):
    args = _parse_args(argv)
    os.makedirs(args.results_dir, exist_ok=True)

    print("Creating dataset...")
    if args.image_path.split(":")[0] == "synthetic":
        # air-gapped stand-in for the reference's packaged photos:
        # 'synthetic[:<size>]' generates (and caches) a procedural
        # multi-frequency test image
        from ..datasets.synthetic import generate_synthetic_image
        from ..utils.assets import default_data_dir
        parts = args.image_path.split(":")
        size = int(parts[1]) if len(parts) > 1 else args.image_size
        args.image_path = os.path.join(default_data_dir(),
                                       f"synthetic_image_{size}.png")
        if not os.path.exists(args.image_path):
            generate_synthetic_image(args.image_path, size)
    data_dir = os.path.join(os.path.dirname(__file__), "..", "..", "data")
    dataset = PixelDataset.create(args.image_path, args.color_space,
                                  args.image_size,
                                  data_dir=os.path.abspath(data_dir))
    if dataset is None:
        print("Dataset unavailable, exiting.")
        raise SystemExit(1)

    rng = jax.random.PRNGKey(args.seed)
    model_rng, init_rng = jax.random.split(rng)
    model = build_model(args.nerf_model, args, rng=model_rng)
    params = model.init(init_rng)
    opt_state = adam_init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, step):
        def loss_fn(p):
            output = jax.nn.sigmoid(model.apply(p, dataset.train_uv))
            return 0.5 * jnp.mean(jnp.square(output - dataset.train_color))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        lr = exponential_lr(args.learning_rate, step, args.decay_rate,
                            args.decay_steps)
        params, opt_state = adam_update(grads, opt_state, params, lr)
        return params, opt_state, loss

    @jax.jit
    def predict(params, uv):
        return jax.nn.sigmoid(model.apply(params, uv))

    # composite frame layout (train_image_regression.py:102-118)
    size = args.image_size
    if args.omit_gt and not args.activations:
        width, height = size, size
    elif args.vertical:
        width, height = size, 2 * size
    else:
        width, height = 2 * size, size
    frame = np.zeros((height, width, 3), np.uint8)
    if not args.omit_gt:
        if args.vertical:
            frame[:size, :] = dataset.image
        else:
            frame[:, :size] = dataset.image

    writer = None
    if args.make_video:
        import cv2
        writer = cv2.VideoWriter(
            os.path.join(args.results_dir, "training.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), 5, (width, height))

    log = []
    for step in range(args.num_steps + 1):
        if step % args.report_interval == 0 or step == args.num_steps:
            output = predict(params, dataset.val_uv)
            psnr_val = dataset.psnr(output)
            print("step", step, "val:", psnr_val)
            log.append((step, psnr_val))
            image = dataset.to_image(output)
            if args.omit_gt and not args.activations:
                frame[:] = image
            elif args.vertical:
                frame[size:, :] = image
            else:
                frame[:, size:] = image
            if args.activations:
                act_image = dataset.to_act_image(model, params, size)
                if args.vertical:
                    frame[:size, :] = act_image
                else:
                    frame[:, :size] = act_image

            import cv2
            bgr = cv2.cvtColor(frame, cv2.COLOR_RGB2BGR)
            cv2.imwrite(os.path.join(args.results_dir,
                                     f"val{step:05}.png"), bgr)
            if writer is not None:
                writer.write(bgr)

        params, opt_state, _ = train_step(params, opt_state,
                                          jnp.asarray(step, jnp.int32))

    # 2x super-resolution render (train_image_regression.py:188-196)
    uvs = PixelDataset.generate_uvs(size * 2)
    output = predict(params, uvs)
    image = dataset.to_image(output, size * 2)
    import cv2
    cv2.imwrite(os.path.join(args.results_dir, "superres.png"),
                cv2.cvtColor(image, cv2.COLOR_RGB2BGR))

    if writer is not None:
        writer.release()

    with open(os.path.join(args.results_dir, "log.txt"), "w") as file:
        file.write("step\tpsnr_val\n")
        for step_num, psnr_val in log:
            file.write(f"{step_num}\t{psnr_val}\n")

    save_model(model, params, os.path.join(args.results_dir, "model.npz"))
    return log


if __name__ == "__main__":
    main()
