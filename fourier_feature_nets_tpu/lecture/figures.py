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
           "spectral_bias_figure", "fourier1d_figure",
           "fourier2d_figure", "save_all_figures"]


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


def fourier1d_figure(signal_fn=None, num_samples=64, num_freqs=4,
                     tsv_path=None):
    """Top Fourier basis functions + progressive reconstructions of a
    1-D signal (figures/fourier1d.py equivalent; optional TSV export
    in the reference's column layout).

    Args:
        signal_fn: callable t -> y over [0, 2); defaults to the
            reference's multifreq signal.
        num_samples: FFT size.
        num_freqs: how many dominant frequencies to plot/accumulate.
        tsv_path: when set, also writes the reference's
            ``fourier_plots.tsv`` table (t, f(t), basis_i..., recon_i...).
    """
    plt = _agg_plt()
    if signal_fn is None:
        # the canonical lecture signal — one definition
        # (spectral_bias_figure and save_all_figures use the same)
        from ..cli.train_signal_regression import multifreq as signal_fn

    t = np.linspace(0, 2, num_samples)
    y = signal_fn(t)
    y_freq = np.fft.fft(y)
    order = np.argsort(np.abs(y_freq[:num_samples // 2]))[::-1]

    basis, recon = [], []
    subset_acc = np.zeros_like(y_freq)
    for i in range(num_freqs):
        f = order[i]
        single = np.zeros_like(y_freq)
        single[f] = y_freq[f]
        single[-f] = y_freq[-f]
        basis.append(np.fft.ifft(single).real)
        subset_acc[f] = y_freq[f]
        subset_acc[-f] = y_freq[-f]
        recon.append(np.fft.ifft(subset_acc).real)

    if tsv_path:
        with open(tsv_path, "w") as file:
            file.write("\t".join(
                ["t", "f(t)"]
                + [f"basis{i}" for i in range(num_freqs)]
                + [f"recon{i}" for i in range(num_freqs)]) + "\n")
            for k in range(num_samples):
                vals = [t[k], y[k]] + [b[k] for b in basis] \
                    + [r[k] for r in recon]
                file.write("\t".join(str(v) for v in vals) + "\n")

    fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(11, 4))
    ax0.plot(t, y, "k-", linewidth=2, label="signal")
    for i, b in enumerate(basis):
        ax0.plot(t, b, "--", label=f"basis {i}")
    ax0.set_title("dominant Fourier basis functions")
    ax0.legend(fontsize=8)
    ax1.plot(t, y, "k-", linewidth=2, label="signal")
    for i, r in enumerate(recon):
        ax1.plot(t, r, "--", label=f"top-{i + 1} recon")
    ax1.set_title("progressive reconstruction")
    ax1.legend(fontsize=8)
    fig.tight_layout()
    return fig


def fourier2d_figure(image=None, size=64, num_gratings=3):
    """2-D spectrum + individual sinusoidal gratings of an image
    (figures/fourier2d.py equivalent).

    Args:
        image: (H, W) grayscale float array; defaults to a rendered
            view of the synthetic scene (no image files needed).
        size: image side when rendering the default image.
        num_gratings: dominant non-DC gratings to visualize.
    """
    plt = _agg_plt()
    if image is None:
        from ..cameras import Resolution
        from ..datasets.synthetic import (
            make_scene_volume,
            render_dataset_images,
        )
        from ..utils.camera_paths import orbit

        cams = orbit(np.array([0.0, 1.0, 0.0]),
                     np.array([0.0, 0.0, 1.0]), 2, 40.0,
                     Resolution(size, size), 3.0)
        bounds = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
        volume = make_scene_volume(32)
        rgba = render_dataset_images(volume, cams, bounds,
                                     num_samples=64)[0]
        image = (rgba[..., :3].astype(np.float32)
                 * (rgba[..., 3:] / 255.0)).mean(-1) / 255.0

    freq = np.fft.fftshift(np.fft.fft2(np.fft.ifftshift(image)))
    mag = np.abs(freq)
    center = np.array(mag.shape) // 2
    flat = mag.copy()
    flat[center[0], center[1]] = 0  # drop DC for grating selection
    order = np.argsort(flat.reshape(-1))[::-1]

    fig, axes = plt.subplots(1, 2 + num_gratings,
                             figsize=(3 * (2 + num_gratings), 3.2))
    axes[0].imshow(image, cmap="gray")
    axes[0].set_title("image")
    axes[1].imshow(np.log1p(mag), cmap="magma")
    axes[1].set_title("log spectrum")
    shown = 0
    used = set()
    for pos in order:
        if shown >= num_gratings:
            break
        r, c = divmod(int(pos), mag.shape[1])
        # conjugate pairs produce the same grating; show each once
        if (r, c) in used:
            continue
        used.add((r, c))
        used.add(((2 * center[0] - r) % mag.shape[0],
                  (2 * center[1] - c) % mag.shape[1]))
        single = np.zeros_like(freq)
        single[r, c] = freq[r, c]
        rr = (2 * center[0] - r) % mag.shape[0]
        cc = (2 * center[1] - c) % mag.shape[1]
        single[rr, cc] = freq[rr, cc]
        grating = np.fft.fftshift(
            np.fft.ifft2(np.fft.ifftshift(single))).real
        axes[2 + shown].imshow(grating, cmap="gray")
        axes[2 + shown].set_title(
            f"grating ({r - center[0]}, {c - center[1]})")
        shown += 1
    for ax in axes:
        ax.set_axis_off()
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
        "fourier1d.png": lambda: fourier1d_figure(
            tsv_path=os.path.join(output_dir, "fourier_plots.tsv")),
        "fourier2d.png": fourier2d_figure,
    }
    for name, make in figures.items():
        fig = make()
        fig.savefig(os.path.join(output_dir, name), dpi=120)
        print("wrote", name)
