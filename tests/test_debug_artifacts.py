"""Tests for the flag-gated debug artifact writers."""
import os

import numpy as np

from loner_tpu.common.frame import Frame
from loner_tpu.common.pose import Pose
from loner_tpu.common.sensors import LidarScan
from loner_tpu.runtime.debug_artifacts import (
    dump_frame_point_cloud,
    dump_ray_point_cloud,
    log_losses,
    rays_to_points,
    visualize_loss,
)


def _scan(n=32):
    rng = np.random.default_rng(0)
    d = rng.normal(size=(3, n))
    d /= np.linalg.norm(d, axis=0)
    return LidarScan(d.astype(np.float32), np.full(n, 2.0, np.float32), np.linspace(0, 1, n))


def test_frame_cloud_dump(tmp_path):
    frame = Frame(lidar_points=_scan())
    frame._lidar_pose = Pose.identity()
    dump_frame_point_cloud(frame, str(tmp_path), 3)
    assert os.path.exists(tmp_path / "frames" / "cloud_3.pcd")


def test_ray_dump_and_endpoints(tmp_path):
    rays = np.zeros((8, 11), np.float32)
    rays[:, 3] = 1.0  # +x dirs
    depths = np.full(8, 2.5, np.float32)
    pts = rays_to_points(rays, depths)
    np.testing.assert_allclose(pts[:, 0], 2.5)
    dump_ray_point_cloud(rays, depths, str(tmp_path), "kf_0")
    assert os.path.exists(tmp_path / "rays" / "kf_0_rays.pcd")
    assert os.path.exists(tmp_path / "rays" / "kf_0_origins.pcd")


def test_loss_logs(tmp_path):
    log_losses(np.arange(5.0), np.ones(5), str(tmp_path), keyframe_count=2, phase_idx=1)
    assert os.path.exists(tmp_path / "losses" / "keyframe_2" / "phase_1.csv")
    assert os.path.exists(tmp_path / "depth_eps" / "keyframe_2" / "phase_1.csv")
    loaded = np.loadtxt(tmp_path / "losses" / "keyframe_2" / "phase_1.csv")
    np.testing.assert_allclose(loaded, np.arange(5.0))


def test_visualize_loss(tmp_path):
    z = np.linspace(1, 9, 64)[None]
    wp = np.exp(-0.5 * ((z - 5.0) / 0.5) ** 2)
    wg = wp / wp.sum()
    fname = visualize_loss(z, wp, wg, 5.0, 1.0, 0.5, str(tmp_path), global_step=7)
    assert fname is not None and os.path.exists(fname)
