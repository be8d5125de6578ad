"""Importing reference-format PyTorch checkpoints for every model
family (utils.py:479-503 dispatch parity). The .pt files are written
here with the exact state-dict layout the reference's save() methods
produce (fourier_feature_models.py:80-89, nerf_model.py:126-135,
voxels_model.py:47-56)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fourier_feature_nets_tpu.models import NeRF, Voxels, load_model

torch = pytest.importorskip("torch")


def test_import_nerf_checkpoint(tmp_path, rng):
    cfg = dict(num_layers=2, num_channels=16, max_log_scale_pos=3.0,
               num_freq_pos=4, max_log_scale_view=1.0, num_freq_view=2,
               skips=[1], include_inputs=True)
    our_model = NeRF(**cfg)

    def t(shape):
        return torch.from_numpy(rng.normal(0, 0.1, shape)
                                .astype(np.float32))

    n_pos = our_model.num_pos_encoded
    n_view = our_model.num_view_encoded
    state = {
        "type": "nerf", "params": cfg,
        "pos_encoding": torch.from_numpy(
            np.asarray(our_model.pos_encoding)),
        "view_encoding": torch.from_numpy(
            np.asarray(our_model.view_encoding)),
        "layers.0.weight": t((16, n_pos)), "layers.0.bias": t((16,)),
        "layers.1.weight": t((16, 16 + n_pos)),
        "layers.1.bias": t((16,)),
        "opacity_out.weight": t((1, 16)), "opacity_out.bias": t((1,)),
        "bottleneck.weight": t((16, 16)), "bottleneck.bias": t((16,)),
        "hidden_view.weight": t((8, 16 + n_view)),
        "hidden_view.bias": t((8,)),
        "color_out.weight": t((3, 8)), "color_out.bias": t((3,)),
    }
    path = str(tmp_path / "nerf.pt")
    torch.save(state, path)

    model, params = load_model(path)
    assert isinstance(model, NeRF)
    assert model.params_manifest["num_layers"] == 2

    pos = rng.uniform(-1, 1, (7, 3)).astype(np.float32)
    views = rng.normal(size=(7, 3)).astype(np.float32)
    out = model.apply(params, jnp.asarray(pos), jnp.asarray(views))
    assert out.shape == (7, 4)

    # torch oracle
    tp, tv = torch.from_numpy(pos), torch.from_numpy(views)
    ep = (tp @ state["pos_encoding"])
    ep = torch.cat([ep.cos(), ep.sin(), tp], -1)
    ev = (tv @ state["view_encoding"])
    ev = torch.cat([ev.cos(), ev.sin(), tv], -1)
    h = torch.relu(ep @ state["layers.0.weight"].T
                   + state["layers.0.bias"])
    h = torch.cat([h, ep], -1)
    h = torch.relu(h @ state["layers.1.weight"].T
                   + state["layers.1.bias"])
    opacity = h @ state["opacity_out.weight"].T + state["opacity_out.bias"]
    b = h @ state["bottleneck.weight"].T + state["bottleneck.bias"]
    hv = torch.relu(torch.cat([b, ev], -1)
                    @ state["hidden_view.weight"].T
                    + state["hidden_view.bias"])
    color = hv @ state["color_out.weight"].T + state["color_out.bias"]
    expected = torch.cat([color, opacity], -1).numpy()
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4,
                               atol=1e-5)


def test_import_voxels_checkpoint(tmp_path, rng):
    side, scale = 6, 2.0
    grid = rng.normal(size=(1, 4, side, side, side)).astype(np.float32)
    bias = rng.normal(size=(1, 4)).astype(np.float32)
    state = {
        "type": "voxels", "params": {"side": side, "scale": scale},
        "voxels": torch.from_numpy(grid),
        "bias": torch.from_numpy(bias),
    }
    path = str(tmp_path / "vox.pt")
    torch.save(state, path)

    model, params = load_model(path)
    assert isinstance(model, Voxels)
    assert model.scale == scale

    positions = rng.uniform(-2, 2, (32, 3)).astype(np.float32)
    ours = np.asarray(model.apply(params, jnp.asarray(positions)))

    tpos = torch.from_numpy(positions / scale).reshape(1, -1, 1, 1, 3)
    out = torch.nn.functional.grid_sample(
        torch.from_numpy(grid), tpos, padding_mode="border",
        align_corners=False)
    expected = out.reshape(4, -1).T.numpy() + bias
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)
