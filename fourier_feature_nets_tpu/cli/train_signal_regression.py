"""CLI: 1-D signal regression.

TPU re-design of /root/reference/train_signal_regression.py: the
full-batch Adam step (loss, grads, update) is a single jitted function
executed on device; visualization snapshots run on host at the report
interval.
"""

import os
from argparse import ArgumentDefaultsHelpFormatter, ArgumentParser
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..datasets.signal_dataset import SignalDataset
from ..models import FourierFeatureMLP, save_model
from ..utils import adam_init, adam_update


def multifreq(x):
    """2 + sin(pi x) + 0.5 sin(2 pi x) - 0.2 cos(5 pi x)."""
    return (2 + np.sin(x * np.pi) + 0.5 * np.sin(2 * x * np.pi)
            - 0.2 * np.cos(5 * x * np.pi))


def triangle(x):
    """Triangle wave with period 1 over [0, 2)."""
    section = 0.5
    out = np.zeros_like(x)
    s0 = x < section
    s1 = (x >= section) & (x < 2 * section)
    s2 = (x >= 2 * section) & (x < 3 * section)
    s3 = x >= 3 * section
    out[s0] = x[s0]
    out[s1] = 2 * section - x[s1]
    out[s2] = x[s2] - 2 * section
    out[s3] = 4 * section - x[s3]
    return out


def sawtooth(x):
    """Sawtooth wave with period 0.5 over [0, 2)."""
    return x % 0.5


SIGNALS = {"multifreq": multifreq, "sawtooth": sawtooth,
           "triangle": triangle}


class LogEntry(NamedTuple):
    step: int
    train_loss: float
    val_loss: float


def _parse_args(argv=None):
    parser = ArgumentParser("1-D Signal Regression",
                            formatter_class=ArgumentDefaultsHelpFormatter)
    parser.add_argument("signal", choices=sorted(SIGNALS))
    parser.add_argument("results_dir", help="Output directory")
    parser.add_argument("--num-channels", type=int, default=64)
    parser.add_argument("--num-layers", type=int, default=1)
    parser.add_argument("--num-samples", type=int, default=32)
    parser.add_argument("--sample-rate", type=int, default=8)
    parser.add_argument("--num-plot", type=int, default=48)
    parser.add_argument("--max-hidden", type=int, default=10)
    parser.add_argument("--fourier", action="store_true",
                        help="Use hand-built Fourier features")
    parser.add_argument("--resolution", default="1280x720")
    parser.add_argument("--num-steps", type=int, default=10000)
    parser.add_argument("--make-video", action="store_true")
    parser.add_argument("--framerate", type=int, default=5)
    parser.add_argument("--no-plot", action="store_true")
    parser.add_argument("--report-interval", type=int, default=50)
    parser.add_argument("--seed", type=int, default=20080524)
    return parser.parse_args(argv)


def main(argv=None):
    args = _parse_args(argv)
    dataset = SignalDataset.create(SIGNALS[args.signal], args.num_samples,
                                   args.sample_rate)

    if args.fourier:
        # Hand-built Fourier series: b = 1..N/2, a = 1/b
        # (train_signal_regression.py:114-118).
        b_values = np.arange(1, args.num_samples // 2 + 1,
                             dtype=np.float32).reshape(1, -1)
        a_values = 1 / np.arange(1, args.num_samples // 2 + 1,
                                 dtype=np.float32)
    else:
        a_values = b_values = None
    learning_rate = 5e-4

    model = FourierFeatureMLP(1, 1, a_values, b_values,
                              [args.num_channels] * args.num_layers)
    params = model.init(jax.random.PRNGKey(args.seed))
    # Final bias initialized to the train-set mean
    # (train_signal_regression.py:126).
    params["layers"][-1]["bias"] = jnp.mean(dataset.train_y)[None]

    os.makedirs(args.results_dir, exist_ok=True)
    opt_state = adam_init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state):
        def loss_fn(p):
            return jnp.mean(jnp.square(
                model.apply(p, dataset.train_x) - dataset.train_y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = adam_update(grads, opt_state, params,
                                        learning_rate, weight_decay=1e-3)
        return params, opt_state, loss

    @jax.jit
    def val_loss_fn(params):
        return jnp.mean(jnp.square(
            model.apply(params, dataset.val_x) - dataset.val_y))

    width, height = (int(v) for v in args.resolution.split("x"))
    plotting = not args.no_plot
    if plotting:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(width / 100, height / 100), dpi=100)
        colors = plt.get_cmap("viridis")(
            np.linspace(0, 1, args.num_plot))[..., :3]
        hidden_ax = fig.add_subplot(121)
        space_ax = fig.add_subplot(122)

    writer = None
    if args.make_video:
        import cv2
        writer = cv2.VideoWriter(
            os.path.join(args.results_dir, "training.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), args.framerate,
            (width, height))

    log = []
    for step in range(args.num_steps + 1):
        params, opt_state, loss = train_step(params, opt_state)
        if step % args.report_interval == 0 or step == args.num_steps:
            val_loss = float(val_loss_fn(params))
            train_loss = float(loss)
            print(step, "train:", train_loss, "val:", val_loss)
            log.append(LogEntry(step, train_loss, val_loss))
            if plotting:
                space_ax.cla()
                hidden_ax.cla()
                hidden_ax.set_title("Hidden Layer Basis")
                space_ax.set_title("{}MLP {}x{} {:.3f}@{:05d}".format(
                    "Fourier " if args.fourier else "", args.num_layers,
                    args.num_channels, val_loss, step))
                dataset.plot(space_ax, hidden_ax, model, params,
                             args.num_plot, colors, args.max_hidden)
                fig.tight_layout()
                fig.canvas.draw()
                pixels = np.asarray(fig.canvas.buffer_rgba())[..., :3]
                if writer is not None:
                    import cv2
                    writer.write(cv2.cvtColor(pixels, cv2.COLOR_RGB2BGR))

    if writer is not None:
        writer.release()
    if plotting:
        fig.savefig(os.path.join(args.results_dir, "final.png"))

    with open(os.path.join(args.results_dir, "log.txt"), "w") as file:
        file.write("step\ttrain_loss\tval_loss\n")
        for entry in log:
            file.write(f"{entry.step}\t{entry.train_loss}\t"
                       f"{entry.val_loss}\n")

    save_model(model, params,
               os.path.join(args.results_dir, "model.npz"))
    return log


if __name__ == "__main__":
    main()
