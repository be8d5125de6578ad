"""Lecture figures: why Fourier features work.

Matplotlib re-creations of the reference's lecture companion figures
(/root/reference/figures/, 256 LoC of FFT/NTK illustrations): signal
spectra, the spectral bias of plain MLPs vs Fourier-feature MLPs, and
encoding-matrix visualizations. All figures are generated from the
framework's own models and ops.
"""

import numpy as np

from ..ops.encoding import (
    gaussian_encoding_matrix,
    positional_encoding_matrix,
)

__all__ = ["signal_spectrum_figure", "encoding_matrix_figure",
           "spectral_bias_figure", "save_all_figures"]


def _agg_plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def signal_spectrum_figure(signal_fn, num_samples=512, label="signal"):
    """Signal + magnitude spectrum side by side."""
    plt = _agg_plt()
    x = np.linspace(0, 2, num_samples, endpoint=False)
    y = signal_fn(x)
    spectrum = np.abs(np.fft.rfft(y)) / num_samples
    freqs = np.fft.rfftfreq(num_samples, d=2 / num_samples)

    fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(10, 4))
    ax0.plot(x, y)
    ax0.set_title(label)
    ax0.set_xlabel("x")
    ax1.stem(freqs[:40], spectrum[:40])
    ax1.set_title("magnitude spectrum")
    ax1.set_xlabel("frequency")
    fig.tight_layout()
    return fig


def encoding_matrix_figure(max_log_scale=6.0, embedding_size=64,
                           sigma=10.0):
    """Positional vs Gaussian encoding matrices as heatmaps."""
    plt = _agg_plt()
    import jax

    pos_b = positional_encoding_matrix(max_log_scale,
                                       embedding_size // 2, 2)
    gauss_b = gaussian_encoding_matrix(jax.random.PRNGKey(0), sigma, 2,
                                       embedding_size)

    fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(10, 3))
    im0 = ax0.imshow(pos_b, aspect="auto", cmap="RdBu")
    ax0.set_title("positional (log-spaced axis-aligned)")
    fig.colorbar(im0, ax=ax0)
    im1 = ax1.imshow(gauss_b, aspect="auto", cmap="RdBu")
    ax1.set_title(f"gaussian (sigma={sigma})")
    fig.colorbar(im1, ax=ax1)
    fig.tight_layout()
    return fig


def spectral_bias_figure(num_steps=600, num_channels=64):
    """Trains a plain MLP and a Fourier MLP on a multi-frequency
    signal and plots what each learns — the lecture's core point."""
    plt = _agg_plt()
    import jax
    import jax.numpy as jnp

    from ..cli.train_signal_regression import multifreq
    from ..datasets.signal_dataset import SignalDataset
    from ..models import BasicFourierMLP, FourierFeatureMLP, MLP
    from ..utils import adam_init, adam_update

    dataset = SignalDataset.create(multifreq, 32, 8)

    def train(model):
        params = model.init(jax.random.PRNGKey(0))
        opt = adam_init(params)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                return jnp.mean(jnp.square(
                    model.apply(p, dataset.train_x) - dataset.train_y))
            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, opt = adam_update(grads, opt, params, 5e-4,
                                      weight_decay=1e-3)
            return params, opt
        for _ in range(num_steps):
            params, opt = step(params, opt)
        return np.asarray(model.apply(params, dataset.val_x)).reshape(-1)

    b = np.arange(1, 17, dtype=np.float32).reshape(1, -1)
    a = 1 / np.arange(1, 17, dtype=np.float32)
    models = {
        "plain MLP": MLP(1, 1, num_layers=1, num_channels=num_channels),
        "basic Fourier": BasicFourierMLP(1, 1, num_layers=1,
                                         num_channels=num_channels),
        "Fourier series": FourierFeatureMLP(1, 1, a, b, [num_channels]),
    }

    fig, axes = plt.subplots(1, len(models), figsize=(13, 4),
                             sharey=True)
    x = np.asarray(dataset.val_x).reshape(-1)
    y = np.asarray(dataset.val_y).reshape(-1)
    for ax, (name, model) in zip(axes, models.items()):
        pred = train(model)
        ax.plot(x, y, "r-", label="target", linewidth=1)
        ax.plot(x, pred, "b-", label="learned", linewidth=1)
        ax.plot(np.asarray(dataset.train_x).reshape(-1),
                np.asarray(dataset.train_y).reshape(-1), "go",
                markersize=3, label="train")
        ax.set_title(name)
        ax.legend()
    fig.suptitle("Spectral bias: what each architecture can learn")
    fig.tight_layout()
    return fig


def save_all_figures(output_dir: str):
    """Renders every lecture figure to PNG."""
    import os

    from ..cli.train_signal_regression import multifreq, sawtooth

    os.makedirs(output_dir, exist_ok=True)
    figures = {
        "signal_multifreq.png": lambda: signal_spectrum_figure(
            multifreq, label="multifreq"),
        "signal_sawtooth.png": lambda: signal_spectrum_figure(
            sawtooth, label="sawtooth"),
        "encoding_matrices.png": encoding_matrix_figure,
        "spectral_bias.png": spectral_bias_figure,
    }
    for name, make in figures.items():
        fig = make()
        fig.savefig(os.path.join(output_dir, name), dpi=120)
        print("wrote", name)
