"""Camera geometry and camera-path tests."""

import numpy as np
import pytest

from fourier_feature_nets_tpu.cameras import (
    CameraInfo,
    Resolution,
    pixel_grid,
    raycast_grid,
)
from fourier_feature_nets_tpu.utils import hemisphere, orbit


def _simple_camera(width=64, height=64, distance=4.0):
    focal = 0.5 * width / np.tan(0.5 * np.deg2rad(40.0))
    intrinsics = np.array([[focal, 0, width / 2],
                           [0, focal, height / 2],
                           [0, 0, 1]], np.float32)
    extrinsics = np.eye(4, dtype=np.float32)
    extrinsics[2, 3] = -distance  # camera at -z looking along +z
    return CameraInfo.create("cam", Resolution(width, height),
                             intrinsics, extrinsics)


class TestResolution:
    def test_scale_to_height(self):
        assert Resolution(800, 400).scale_to_height(100) == Resolution(
            200, 100)

    def test_square_and_ratio(self):
        assert Resolution(800, 400).square() == Resolution(400, 400)
        assert Resolution(800, 400).ratio == 2.0


class TestCameraInfo:
    def test_project_unproject_roundtrip(self, rng):
        camera = _simple_camera()
        points = rng.uniform(8, 56, (32, 2)).astype(np.float32)
        world = camera.unproject(points)
        back = camera.project(world[:, :3])
        np.testing.assert_allclose(back, points, rtol=1e-3, atol=1e-3)

    def test_center_ray_hits_origin(self):
        camera = _simple_camera()
        ray = camera.raycast(np.array([[32.0, 32.0]]))
        np.testing.assert_allclose(ray.origin[0], [0, 0, -4], atol=1e-5)
        np.testing.assert_allclose(ray.direction[0], [0, 0, 1], atol=1e-4)

    def test_ray_directions_unit_norm(self, rng):
        camera = _simple_camera()
        points = rng.uniform(0, 64, (100, 2)).astype(np.float32)
        ray = camera.raycast(points)
        np.testing.assert_allclose(np.linalg.norm(ray.direction, axis=-1),
                                   1.0, rtol=1e-5)

    def test_fov_roundtrip(self):
        camera = _simple_camera()
        assert camera.fov_y_degrees == pytest.approx(40.0, rel=1e-3)

    def test_pixel_grid_order(self):
        grid = pixel_grid(Resolution(3, 2))
        expected = [[0, 0], [1, 0], [2, 0], [0, 1], [1, 1], [2, 1]]
        np.testing.assert_array_equal(grid, expected)

    def test_raycast_grid_layout(self):
        cams = [_simple_camera(), _simple_camera()]
        ray = raycast_grid(cams)
        assert ray.origin.shape == (2 * 64 * 64, 3)
        np.testing.assert_allclose(ray.origin[0], ray.origin[-1])


class TestCameraPaths:
    def test_orbit_cameras_look_at_origin(self):
        cameras = orbit(np.array([0.0, 1.0, 0.0]),
                        np.array([0.0, 0.0, 1.0]), num_frames=20,
                        fov_y_degrees=40.0,
                        resolution=Resolution(64, 64), distance=3.0)
        assert len(cameras) == 20
        for camera in cameras[::5]:
            pos = camera.position[0]
            assert np.linalg.norm(pos) == pytest.approx(3.0, rel=1e-5)
            center = np.array([[32.0, 32.0]])
            ray = camera.raycast(center)
            to_origin = -pos / np.linalg.norm(pos)
            # center ray should point (approximately) at the origin
            assert ray.direction[0] @ to_origin > 0.999

    def test_orbit_altitude_triangle(self):
        cameras = orbit(np.array([0.0, 1.0, 0.0]),
                        np.array([0.0, 0.0, 1.0]), num_frames=40,
                        fov_y_degrees=40.0,
                        resolution=Resolution(32, 32), distance=2.0)
        heights = np.array([c.position[0, 1] for c in cameras])
        # altitude rises over the first half, falls over the second
        assert (np.diff(heights[:20]) > 0).all()
        assert (np.diff(heights[20:]) < 0).all()
        assert heights.min() >= 2.0 * np.sin(np.pi / 12) - 1e-5
        assert heights.max() <= 2.0 * np.sin(np.pi / 4) + 1e-5

    def test_hemisphere_cameras_above_ground(self, rng):
        cameras = hemisphere(np.array([0.0, 1.0, 0.0]),
                             np.array([0.0, 0.0, 1.0]), num_cameras=12,
                             fov_y_degrees=40.0,
                             resolution=Resolution(32, 32),
                             distance=3.0, pos_noise=0.0,
                             rng=np.random.default_rng(0))
        assert len(cameras) == 12
        for camera in cameras:
            pos = camera.position[0]
            assert pos[1] > -0.1  # hemisphere: y >= 0
            ray = camera.raycast(np.array([[16.0, 16.0]]))
            to_origin = -pos / np.linalg.norm(pos)
            assert ray.direction[0] @ to_origin > 0.99


def test_raycast_grid_rejects_mixed_resolutions():
    """The global ray index layout assumes one shared H*W; mixed
    resolutions must fail loudly instead of silently casting every
    camera through camera 0's pixel grid."""
    from fourier_feature_nets_tpu.cameras import (
        CameraInfo,
        Resolution,
        raycast_grid,
    )
    intrinsics = np.array([[10.0, 0, 8], [0, 10.0, 8], [0, 0, 1]],
                          np.float32)
    extrinsics = np.eye(4, dtype=np.float32)
    a = CameraInfo.create("a", Resolution(16, 16), intrinsics,
                          extrinsics)
    b = CameraInfo.create("b", Resolution(8, 8), intrinsics, extrinsics)
    with pytest.raises(ValueError, match="resolution"):
        raycast_grid([a, b])
    with pytest.raises(ValueError):
        raycast_grid([])
