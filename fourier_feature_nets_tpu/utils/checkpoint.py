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
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..models.serialization import _flatten, _unflatten, build_model
from .optim import AdamState

__all__ = ["TrainState", "save_train_state", "load_train_state",
           "latest_checkpoint"]


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
