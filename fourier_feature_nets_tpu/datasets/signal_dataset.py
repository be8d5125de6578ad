"""1-D signal regression dataset.

TPU re-design of the reference signal dataset
(/root/reference/fourier_feature_nets/signal_dataset.py): data lives
as jnp arrays ready for a fully-jitted full-batch train step; the
matplotlib visualization consumes the model's functional
``return_hidden`` output instead of a stateful activations hook.
"""

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np

__all__ = ["SignalData", "SignalDataset"]


class SignalData(NamedTuple):
    """x/y value pairs for a 1-D signal."""

    x: jnp.ndarray
    y: jnp.ndarray


def _get_limits(vals, stretch=1.1):
    vals = np.asarray(vals)
    min_v, max_v = float(vals.min()), float(vals.max())
    mid = 0.5 * (min_v + max_v)
    return mid + stretch * (min_v - mid), mid + stretch * (max_v - mid)


class SignalDataset:
    """Dataset of 1-D signal samples over x in [0, 2)."""

    def __init__(self, train_data: SignalData, val_data: SignalData):
        self.train_x, self.train_y = train_data
        self.val_x, self.val_y = val_data
        self.x_lim = _get_limits(self.val_x)
        self.y_lim = _get_limits(self.val_y)

    @staticmethod
    def create(signal: Callable[[np.ndarray], np.ndarray],
               num_samples: int, sample_rate: int) -> "SignalDataset":
        """Builds train/val splits by dense sampling of ``signal``.

        Parity: signal_dataset.py:40-68 — validation is the dense grid
        of ``num_samples * sample_rate`` points over [0, 2); training
        takes every ``sample_rate``-th point.
        """
        x = np.linspace(0, 2, num_samples * sample_rate,
                        endpoint=False).astype(np.float32)
        y = signal(x).astype(np.float32)
        x = x.reshape(-1, 1)
        y = y.reshape(-1, 1)
        train = SignalData(jnp.asarray(x[::sample_rate]),
                           jnp.asarray(y[::sample_rate]))
        val = SignalData(jnp.asarray(x), jnp.asarray(y))
        return SignalDataset(train, val)

    def plot(self, space_ax, hidden_ax, model, params, num_points: int,
             colors: np.ndarray, max_hidden: int):
        """Plots reconstruction + top-k hidden basis functions.

        Parity: signal_dataset.py:70-127, adapted to the functional
        model API: hidden activations come from
        ``model.apply(..., return_hidden=True)`` and the output
        layer's weights from the param pytree.
        """
        import matplotlib.pyplot as plt

        val_x = np.asarray(self.val_x)
        x_vals = np.linspace(val_x[0, 0], val_x[-1, 0],
                             num_points).astype(np.float32)
        y_vals, activation = model.apply(params,
                                         jnp.asarray(x_vals.reshape(-1, 1)),
                                         return_hidden=True)
        y_vals = np.asarray(y_vals).reshape(-1)
        activation = np.asarray(activation)

        out_layer = params["layers"][-1]
        slope = np.asarray(out_layer["weight"]).reshape(-1)
        bias = float(np.asarray(out_layer["bias"]).reshape(-1)[0])

        activation_values = activation * slope[np.newaxis, :] + bias
        activation_range = (activation_values.max(0)
                            - activation_values.min(0))
        index = np.argsort(activation_range)[::-1][:max_hidden]
        cmap = plt.get_cmap("jet")
        for rank, i in enumerate(index):
            on_index = activation[:, i] > 0
            act_y = activation_values[:, i]
            hidden_ax.plot(x_vals, act_y, color=cmap(rank / max_hidden)[:3],
                           zorder=1, label="h{:02d}".format(i))
            hidden_ax.scatter(x_vals[on_index], act_y[on_index],
                              color=colors[on_index], marker=".", zorder=2)

        active = activation_values[activation > 0]
        if active.size:
            hidden_ax.set_ylim(*_get_limits(active))
        hidden_ax.legend(loc="upper right", ncol=2)
        space_ax.set_xlim(*self.x_lim)
        space_ax.set_ylim(*self.y_lim)
        space_ax.plot(np.asarray(self.val_x), np.asarray(self.val_y),
                      "r-", label="val", zorder=1)
        space_ax.plot(np.asarray(self.train_x), np.asarray(self.train_y),
                      "go", label="train", zorder=2)
        space_ax.scatter(x_vals, y_vals, color=colors, marker="P",
                         label="pred", zorder=3)
        space_ax.legend()
