"""Tests for camera ray geometry and calibration parsing."""
import numpy as np
import pytest

from loner_tpu.common.camera import CameraRayDirections, get_ray_directions, undistort_points
from loner_tpu.common.pose import Pose
from loner_tpu.common.settings import Settings
from loner_tpu.common.world_cube import WorldCube
from loner_tpu.datasets.calibration import load_opencv_yaml


K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])


class TestUndistort:
    def test_zero_distortion_identity(self):
        pts = np.array([[100.0, 50.0], [320.0, 240.0]])
        out = undistort_points(pts, K, np.zeros(5))
        np.testing.assert_allclose(out, pts, atol=1e-9)

    def test_inverts_distortion(self):
        # Distort a known undistorted point, then undistort it back.
        dist = np.array([-0.2, 0.05, 0.001, -0.002, 0.0])
        k1, k2, p1, p2, _ = dist
        x, y = 0.3, -0.2  # normalized coords
        r2 = x * x + y * y
        radial = 1 + k1 * r2 + k2 * r2 * r2
        xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        pix = np.array([[xd * K[0, 0] + K[0, 2], yd * K[1, 1] + K[1, 2]]])
        out = undistort_points(pix, K, dist)
        norm = np.array([(out[0, 0] - K[0, 2]) / K[0, 0], (out[0, 1] - K[1, 2]) / K[1, 1]])
        np.testing.assert_allclose(norm, [x, y], atol=1e-6)


class TestRayDirections:
    def test_principal_point_forward(self):
        dirs, i, j = get_ray_directions(480, 640, K)
        idx = 240 * 640 + 320  # pixel at the principal point
        np.testing.assert_allclose(dirs[idx], [0, 0, 1], atol=1e-6)

    def test_build_rays_in_cube(self):
        calib = Settings(
            {
                "camera_intrinsic": {
                    "k": K,
                    "new_k": None,
                    "distortion": None,
                    "width": 64,
                    "height": 48,
                }
            }
        )
        crd = CameraRayDirections(calib, chunk_size=512)
        cube = WorldCube(10.0, np.zeros(3))
        rays = crd.fetch_chunk_rays(0, Pose.identity(), cube, (1.0, 8.0))
        assert rays.shape[1] == 11
        norms = np.linalg.norm(rays[:, 3:6], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        assert np.all(rays[:, 10] <= np.sqrt(3) + 1e-5)  # far <= cube diagonal


class TestOpencvYaml:
    def test_matrix_parsing(self, tmp_path):
        f = tmp_path / "cam.yaml"
        f.write_text(
            "%YAML:1.0\n---\n"
            "image_width: 640\nimage_height: 480\n"
            "camera_matrix: !!opencv-matrix\n"
            "   rows: 3\n   cols: 3\n   dt: d\n"
            "   data: [400., 0., 320., 0., 400., 240., 0., 0., 1.]\n"
        )
        data = load_opencv_yaml(str(f))
        assert data["image_width"] == 640
        np.testing.assert_allclose(data["camera_matrix"], K)
