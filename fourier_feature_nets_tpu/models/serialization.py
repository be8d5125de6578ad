"""Self-describing model checkpoints.

Like the reference's ``save``/``load_model`` scheme
(/root/reference/fourier_feature_nets/fourier_feature_models.py:80-89,
utils.py:448-503), every checkpoint embeds a ``type`` tag and the
constructor ``params`` so loading needs no external configuration.
Storage is a plain NPZ: a JSON manifest plus the flattened parameter
pytree — readable anywhere NumPy is, no torch/pickle dependency.

For cross-validation against the PyTorch reference,
:func:`load_torch_model` imports the reference's ``.pt`` checkpoints
(weights transposed to the x @ W convention) when torch is available,
and :func:`save_torch_model` writes checkpoints the reference's own
``utils.load_model`` (utils.py:448-503) accepts — interchange works in
BOTH directions, so models trained here drop into the reference's
rendering/visualization scripts unchanged.
"""

import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .factorized import FactorizedVoxels
from .fourier import FourierFeatureMLP
from .module import Model
from .nerf import NeRF
from .voxels import Voxels

__all__ = ["save_model", "load_model", "load_torch_model",
           "save_torch_model"]

_MODEL_TYPES = {
    "fourier": FourierFeatureMLP,
    "nerf": NeRF,
    "voxels": Voxels,
    "factorized_voxels": FactorizedVoxels,
}


def _flatten(tree, prefix=""):
    """Flattens a nested dict/list param tree to {path: array}."""
    if isinstance(tree, dict):
        out = {}
        for key, value in tree.items():
            out.update(_flatten(value, f"{prefix}{key}/"))
        return out
    if isinstance(tree, (list, tuple)):
        out = {}
        for i, value in enumerate(tree):
            out.update(_flatten(value, f"{prefix}{i}/"))
        return out
    return {prefix[:-1]: np.asarray(tree)}


def _unflatten(flat):
    """Inverts :func:`_flatten`; integer path segments become lists."""
    tree = {}
    for path, value in flat.items():
        keys = path.split("/")
        node = tree
        for key in keys[:-1]:
            node = node.setdefault(key, {})
        node[keys[-1]] = jnp.asarray(value)

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [listify(node[str(i)]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def save_model(model: Model, params, path: str):
    """Saves a model + parameters to a self-describing NPZ checkpoint.

    The checkpoint lands at EXACTLY ``path``: writing through an open
    file handle stops ``np.savez`` from appending ``.npz`` to
    non-.npz paths (which would strand the file where a later
    ``load_model(path)`` cannot find it).
    """
    manifest = {"type": model.model_type, "params": model.params_manifest}
    flat = _flatten(params)
    with open(path, "wb") as handle:
        np.savez(handle, __manifest__=json.dumps(manifest), **flat)


def build_model(model_type: str, ctor_params: dict) -> Model:
    """Reconstructs a model object from its manifest."""
    if model_type not in _MODEL_TYPES:
        raise ValueError(f"Unrecognized model type: {model_type}")
    ctor_params = dict(ctor_params)
    if model_type == "fourier":
        for key in ("a_values", "b_values"):
            if ctor_params.get(key) is not None:
                ctor_params[key] = np.asarray(ctor_params[key], np.float32)
    return _MODEL_TYPES[model_type](**ctor_params)


def load_model(path: str) -> Tuple[Model, dict]:
    """Loads a model from an NPZ (or reference .pt) checkpoint.

    When ``path`` does not exist but its basename is a known pretrained
    asset, the checkpoint is downloaded to the framework cache first
    (reference utils.py:448-477 behavior). Offline, the download fails
    gracefully and a FileNotFoundError with the asset name is raised.

    Returns:
        (model, params): the reconstructed model object and its
        parameter pytree.
    """
    if not os.path.exists(path):
        from ..utils.assets import ASSETS, default_data_dir, download_asset

        name = os.path.basename(path)
        cached = os.path.join(default_data_dir(), "models", name)
        if os.path.exists(cached):
            path = cached
        elif name in ASSETS:
            print("Downloading model...")
            if download_asset(name, cached):
                path = cached
            else:
                raise FileNotFoundError(
                    f"{path}: known asset {name!r} could not be "
                    "downloaded (offline?)")
        else:
            raise FileNotFoundError(path)
    if path.endswith(".pt") or path.endswith(".pth"):
        return load_torch_model(path)
    with np.load(path, allow_pickle=False) as data:
        manifest = json.loads(str(data["__manifest__"]))
        flat = {k: data[k] for k in data.files if k != "__manifest__"}
    model = build_model(manifest["type"], manifest["params"])
    if manifest.get("format") == "ffn_tpu_train_state_v1":
        # Resumable train-state checkpoint (utils/checkpoint.py): the
        # model weights live under the params/ prefix next to the Adam
        # moments; serve/orbit/distill callers want just the weights.
        flat = {k[len("params/"):]: v for k, v in flat.items()
                if k.startswith("params/")}
    return model, _unflatten(flat)


def save_torch_model(model: Model, params, path: str):
    """Exports a model to the reference's PyTorch ``.pt`` format.

    The written file is loadable by the reference's ``load_model``
    (utils.py:448-503) / ``load_state_dict``: Linear weights are
    transposed back to torch's (out, in), the Voxels grid to
    (1, 4, D, H, W), and the non-trainable buffers the reference
    registers as parameters (``pos_encoding``/``view_encoding``,
    fourier ``a_values``/``b_values``) are included so strict
    ``load_state_dict`` finds every key.
    """
    import torch  # local import: torch is optional at runtime

    def tensor(value):
        return torch.from_numpy(np.ascontiguousarray(
            np.asarray(value, np.float32)))

    def linear(layer):
        weight = tensor(layer["weight"]).T.contiguous()
        return weight, tensor(layer["bias"])

    state = {"type": model.model_type, "params": model.params_manifest}
    if model.model_type == "fourier":
        # fourier_feature_models.py:44-56: a/b registered only when the
        # encoding exists (MLP variant has none).
        if getattr(model, "b_values", None) is not None:
            state["a_values"] = tensor(model.a_values)
            state["b_values"] = tensor(model.b_values)
        for i, layer in enumerate(params["layers"]):
            state[f"layers.{i}.weight"], state[f"layers.{i}.bias"] = (
                linear(layer))
    elif model.model_type == "nerf":
        # nerf_model.py:45-48: encodings are non-grad nn.Parameters.
        state["pos_encoding"] = tensor(model.pos_encoding)
        state["view_encoding"] = tensor(model.view_encoding)
        for i, layer in enumerate(params["layers"]):
            state[f"layers.{i}.weight"], state[f"layers.{i}.bias"] = (
                linear(layer))
        for head in ("opacity_out", "bottleneck", "hidden_view",
                     "color_out"):
            state[f"{head}.weight"], state[f"{head}.bias"] = linear(
                params[head])
    elif model.model_type == "voxels":
        # voxels_model.py:26-31: grid (1, 4, D, H, W), bias (1, 4).
        grid = np.asarray(params["voxels"], np.float32)
        state["voxels"] = tensor(np.moveaxis(grid, -1, 0)[None])
        state["bias"] = tensor(params["bias"])[None]
    else:
        raise ValueError(
            f"Model type {model.model_type!r} has no reference torch "
            "format (use save_model for the native NPZ checkpoint)")
    torch.save(state, path)


def load_torch_model(path: str) -> Tuple[Model, dict]:
    """Imports a reference PyTorch checkpoint (utils.py:479-503 parity).

    Torch Linear weights are (out, in); they are transposed to this
    framework's (in, out) convention. The Voxels grid moves from
    (1, 4, D, H, W) to (D, H, W, 4).
    """
    import torch  # local import: torch is optional at runtime

    state_dict = torch.load(path, map_location="cpu", weights_only=False)
    model_type = state_dict.pop("type")
    ctor_params = state_dict.pop("params")
    model = build_model(model_type, ctor_params)

    tensors = {k: v.detach().cpu().numpy() for k, v in state_dict.items()}

    if model_type in ("fourier",):
        layers = []
        i = 0
        while f"layers.{i}.weight" in tensors:
            layers.append({
                "weight": jnp.asarray(tensors[f"layers.{i}.weight"].T),
                "bias": jnp.asarray(tensors[f"layers.{i}.bias"]),
            })
            i += 1
        params = {"layers": layers}
    elif model_type == "nerf":
        layers = []
        i = 0
        while f"layers.{i}.weight" in tensors:
            layers.append({
                "weight": jnp.asarray(tensors[f"layers.{i}.weight"].T),
                "bias": jnp.asarray(tensors[f"layers.{i}.bias"]),
            })
            i += 1
        params = {"layers": layers}
        for head in ("opacity_out", "bottleneck", "hidden_view",
                     "color_out"):
            params[head] = {
                "weight": jnp.asarray(tensors[f"{head}.weight"].T),
                "bias": jnp.asarray(tensors[f"{head}.bias"]),
            }
    elif model_type == "voxels":
        voxels = tensors["voxels"][0]  # (4, D, H, W)
        params = {
            "voxels": jnp.asarray(np.moveaxis(voxels, 0, -1)),
            "bias": jnp.asarray(tensors["bias"][0]),
        }
    else:
        raise ValueError(f"Unrecognized model type: {model_type}")

    return model, params
