"""Training-state checkpointing with resume.

The reference only persists final model weights
(/root/reference/fourier_feature_nets/fourier_feature_models.py:80-89)
and cannot resume interrupted training (SURVEY.md §5). This module
checkpoints the FULL training state — model manifest + parameters,
Adam moments, step counter and RNG seed — as a single self-describing
NPZ, enabling exact resume. The model portion stays loadable by
``models.load_model`` (same manifest scheme).
"""

import json
import os
import threading
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.serialization import _flatten, _unflatten, build_model
from .optim import AdamState

__all__ = ["TrainState", "save_train_state", "load_train_state",
           "latest_checkpoint", "AsyncCheckpointer"]


class TrainState(NamedTuple):
    """Everything needed to resume a training run exactly."""

    model: object
    params: dict
    opt_state: AdamState
    step: int
    seed: int


def save_train_state(path: str, model, params, opt_state: AdamState,
                     step: int, seed: int = 0):
    """Writes a resumable checkpoint NPZ."""
    manifest = {
        "type": model.model_type,
        "params": model.params_manifest,
        "step": int(step),
        "seed": int(seed),
        "format": "ffn_tpu_train_state_v1",
    }
    flat = _flatten(params, "params/")
    flat.update(_flatten(opt_state.mu, "opt/mu/"))
    flat.update(_flatten(opt_state.nu, "opt/nu/"))
    flat["opt/step"] = np.asarray(opt_state.step)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, __manifest__=json.dumps(manifest), **flat)


def load_train_state(path: str) -> TrainState:
    """Loads a resumable checkpoint NPZ."""
    with np.load(path, allow_pickle=False) as data:
        manifest = json.loads(str(data["__manifest__"]))
        flat = {k: data[k] for k in data.files if k != "__manifest__"}

    fmt = manifest.get("format")
    if fmt != "ffn_tpu_train_state_v1":
        # a weights-only save_model NPZ shares the manifest scheme but
        # carries no optimizer state; without this check it would fail
        # later with an opaque KeyError on 'opt/step'
        raise ValueError(
            f"{path} is not a resumable train-state checkpoint "
            f"(manifest format={fmt!r}); weights-only model files load "
            "via models.load_model")

    model = build_model(manifest["type"], manifest["params"])
    params = _unflatten({k[len("params/"):]: v for k, v in flat.items()
                         if k.startswith("params/")})
    mu = _unflatten({k[len("opt/mu/"):]: v for k, v in flat.items()
                     if k.startswith("opt/mu/")})
    nu = _unflatten({k[len("opt/nu/"):]: v for k, v in flat.items()
                     if k.startswith("opt/nu/")})
    opt_state = AdamState(step=jnp.asarray(flat["opt/step"]),
                          mu=mu, nu=nu)
    return TrainState(model, params, opt_state, manifest["step"],
                      manifest["seed"])


class AsyncCheckpointer:
    """Non-blocking training-state checkpointing.

    The device->host parameter fetch is the slow part of a checkpoint
    (especially through remote runtimes); doing it inline stalls the
    step loop. ``save`` instead takes a device-side ``jnp.copy``
    snapshot — an async dispatch that returns immediately and, being a
    fresh buffer, is immune to the train step's buffer donation — and
    hands fetch + NPZ write to one background thread. The queue is
    depth-1 latest-wins: if training outruns the writer, intermediate
    checkpoints are skipped rather than stalling training. This is the
    orbax-async-checkpointing pattern without the orbax directory
    format, keeping checkpoints single-file NPZ (loadable by
    :func:`load_train_state` / ``models.load_model``).
    """

    def __init__(self, directory: str, prefix: str = "ckpt_",
                 keep: int = 3):
        """Args:
            directory: checkpoint directory (created if needed).
            prefix: filename prefix (``{prefix}{step:08d}.npz``).
            keep: newest checkpoints retained; older ones are pruned.
        """
        self.directory = directory
        self.prefix = prefix
        self.keep = keep
        os.makedirs(directory, exist_ok=True)
        self._pending = None
        self._busy = False
        self._error = None
        self._closed = False
        self._cond = threading.Condition()
        self._thread = threading.Thread(target=self._worker,
                                        daemon=True,
                                        name="ffn-async-ckpt")
        self._thread.start()

    def save(self, model, params, opt_state, step: int, seed: int = 0):
        """Snapshots state on device and enqueues the write."""
        snapshot = (model,
                    jax.tree.map(jnp.copy, params),
                    jax.tree.map(jnp.copy, opt_state),
                    int(step), int(seed))
        with self._cond:
            if self._closed:
                raise RuntimeError("AsyncCheckpointer is closed")
            self._raise_pending_error()
            self._pending = snapshot
            self._cond.notify_all()

    def wait(self):
        """Blocks until all enqueued checkpoints are on disk."""
        with self._cond:
            while self._pending is not None or self._busy:
                self._cond.wait()
            self._raise_pending_error()

    def close(self):
        """Flushes pending writes and stops the worker."""
        self.wait()
        with self._cond:
            self._closed = True
            self._cond.notify_all()
        self._thread.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc_info):
        self.close()
        return False

    def _raise_pending_error(self):
        if self._error is not None:
            error, self._error = self._error, None
            raise error

    def _worker(self):
        while True:
            with self._cond:
                while self._pending is None and not self._closed:
                    self._cond.wait()
                if self._pending is None:
                    return
                item, self._pending = self._pending, None
                self._busy = True
            try:
                self._write(*item)
            except Exception as error:  # surfaced on next save()/wait()
                self._error = error
            with self._cond:
                self._busy = False
                self._cond.notify_all()

    def _write(self, model, params, opt_state, step, seed):
        path = os.path.join(self.directory,
                            f"{self.prefix}{step:08d}.npz")
        save_train_state(path, model, jax.tree.map(np.asarray, params),
                         jax.tree.map(np.asarray, opt_state), step, seed)
        self._prune()

    def _prune(self):
        suffix = ".npz"
        entries = []
        for name in os.listdir(self.directory):
            if name.startswith(self.prefix) and name.endswith(suffix):
                try:
                    entries.append(
                        (int(name[len(self.prefix):-len(suffix)]), name))
                except ValueError:
                    continue
        # unlink the LISTED filename: reconstructing it as %08d would
        # miss non-zero-padded names (e.g. hand-written via
        # save_train_state) and raise FileNotFoundError out of a later
        # unrelated save()/wait()
        for _, name in sorted(entries)[:-self.keep] if self.keep else []:
            os.unlink(os.path.join(self.directory, name))


def latest_checkpoint(directory: str,
                      prefix: str = "ckpt_") -> Optional[str]:
    """Returns the newest ``{prefix}{step}.npz`` in a directory."""
    if not os.path.isdir(directory):
        return None
    best_step, best_path = -1, None
    for name in os.listdir(directory):
        if name.startswith(prefix) and name.endswith(".npz"):
            try:
                step = int(name[len(prefix):-4])
            except ValueError:
                continue
            if step > best_step:
                best_step, best_path = step, os.path.join(directory, name)
    return best_path
