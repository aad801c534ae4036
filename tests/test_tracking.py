"""Tests for ICP, frame synthesis, voxel ops, and sky-ray extraction."""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as _R

import jax.numpy as jnp

from loner_tpu.common.frame import Frame
from loner_tpu.common.pose import Pose
from loner_tpu.common.settings import Settings
from loner_tpu.datasets.synthetic import BoxRoomScene, VirtualLidar, make_scan
from loner_tpu.ops.voxel import voxel_downsample
from loner_tpu.tracking.frame_synthesis import FrameSynthesis
from loner_tpu.tracking.icp import estimate_normals, pad_cloud, run_icp_schedule

SCHEDULE = [
    {"threshold": 1.5, "max_iterations": 10},
    {"threshold": 0.125, "max_iterations": 10},
]


def make_cloud_pair(delta_twist, n_channels=24, n_columns=196, seed=0):
    """Two scans of the box room from poses separated by delta_twist.

    Returns (source, target, true source->target transform). Source is the
    NEW frame, target the reference: ICP estimates T s.t. T @ p_new aligns
    with p_ref, i.e. T = T_ref^-1 @ T_new.
    """
    scene = BoxRoomScene()
    lidar = VirtualLidar(num_channels=n_channels, num_columns=n_columns, max_range=40.0)
    t_ref = Pose.from_twist(np.array([1.0, 0.5, 0.3, 0.0, 0.0, 0.4]))
    t_new = Pose(t_ref.matrix @ Pose.from_twist(delta_twist).matrix)
    target = make_scan(scene, lidar, t_ref, 0.0).end_points()
    source = make_scan(scene, lidar, t_new, 0.0).end_points()
    return source, target, t_ref.inv() * t_new


class TestNormals:
    def test_planar_cloud_normals(self):
        rng = np.random.default_rng(0)
        pts = np.zeros((512, 3), np.float32)
        pts[:, :2] = rng.uniform(-1, 1, (512, 2))
        padded, valid = pad_cloud(pts, 512)
        n = np.asarray(estimate_normals(jnp.asarray(padded), jnp.asarray(valid), k=16))
        # All normals must be +-z.
        assert np.all(np.abs(n[:, 2]) > 0.99)


class TestICP:
    @pytest.mark.parametrize(
        "delta",
        [
            np.array([0.2, -0.1, 0.05, 0.0, 0.0, 0.0]),
            np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.08]),
            np.array([0.15, 0.1, -0.05, 0.02, -0.01, 0.05]),
        ],
    )
    def test_recovers_known_transform(self, delta):
        source, target, t_true = make_cloud_pair(delta)
        result = run_icp_schedule(source, target, SCHEDULE, pad_size=4096)
        est = np.asarray(result.transformation, np.float64)
        err = Pose(est).inv() * t_true
        d_t, d_r = Pose.identity().distance_to(err)
        assert d_t < 0.035, f"translation error {d_t}"
        assert d_r < 1.0, f"rotation error {d_r} deg"
        assert float(result.fitness) > 0.5

    def test_identity_stays_identity(self):
        source, target, _ = make_cloud_pair(np.zeros(6))
        result = run_icp_schedule(source, target, SCHEDULE, pad_size=4096)
        est = np.asarray(result.transformation)
        np.testing.assert_allclose(est, np.eye(4), atol=5e-3)


class TestVoxel:
    def test_voxel_downsample_merges(self):
        pts = np.array([[0.01, 0.01, 0.01], [0.02, 0.02, 0.02], [1.5, 1.5, 1.5]])
        out = voxel_downsample(pts, 0.1)
        assert out.shape[0] == 2
        assert np.any(np.all(np.isclose(out, [0.015, 0.015, 0.015], atol=1e-6), axis=1))


class TestFrameSynthesis:
    def _settings(self, decimate_on_load=False):
        return Settings(
            {
                "frame_decimation_rate_hz": 5,
                "frame_match_tolerance": 0.01,
                "frame_delta_t_sec_tolerance": 0.02,
                "decimate_on_load": decimate_on_load,
            }
        )

    def _scan(self, t0):
        from loner_tpu.common.sensors import LidarScan

        n = 16
        return LidarScan(
            np.ones((3, n), np.float32) / np.sqrt(3),
            np.ones(n, np.float32),
            np.linspace(t0, t0 + 0.09, n),
        )

    def test_decimation_to_5hz(self):
        fs = FrameSynthesis(self._settings(), None, lidar_only=True)
        for i in range(20):  # 10 Hz stream
            fs.process_lidar(self._scan(i * 0.1), None)
        count = 0
        while fs.has_frame():
            fs.pop_frame()
            count += 1
        assert 9 <= count <= 11  # ~half the frames kept

    def test_decimate_on_load_passthrough(self):
        fs = FrameSynthesis(self._settings(decimate_on_load=True), None, lidar_only=True)
        for i in range(10):
            fs.process_lidar(self._scan(i * 0.1), None)
        count = sum(1 for _ in iter(fs.pop_frame, None) if True) if False else 0
        while fs.has_frame():
            fs.pop_frame()
            count += 1
        assert count == 10


class TestSkyRays:
    def test_sky_detected_in_open_ceiling(self):
        from loner_tpu.tracking.tracker import Tracker

        # Scan with no returns above 60 deg elevation: sky.
        lidar = VirtualLidar(
            num_channels=32, num_columns=128, vertical_fov_deg=(-30, 50), max_range=40.0
        )
        scene = BoxRoomScene()
        scan = make_scan(scene, lidar, Pose.identity(), 0.0)
        frame = Frame(lidar_points=scan)
        frame._lidar_pose = Pose.identity()

        # Call compute_sky_rays without constructing a full Tracker.
        Tracker.compute_sky_rays(object.__new__(Tracker), frame)
        sky = frame.lidar_points.sky_rays
        assert sky is not None and sky.shape[1] > 0
        # All sky dirs point above the horizon offset.
        elev = 90 - np.rad2deg(
            np.arctan2(np.sqrt(sky[0] ** 2 + sky[1] ** 2), sky[2])
        )
        assert np.all(elev > 10.0 - 1e-6)


class TestTrackerChainStaysOnSE3:
    """Regression for the round-3 SE(3) manifold-drift bug: device ICP
    registrations are orthonormal only to f32 round-off, and
    _apply_registration composes one per frame for the whole run. The
    pre-fix chain reached det(R)=1.05 within a minute on chip, warping
    motion-compensated keyframe scans by 0.5+ m (ATE 0.084 vs 0.029
    after the fix)."""

    def test_apply_registration_reprojects(self):
        from loner_tpu.common.sensors import LidarScan
        from loner_tpu.common.settings import Settings
        from loner_tpu.tracking.tracker import Tracker

        tracker = Tracker.__new__(Tracker)
        tracker._reference_pose = Pose.identity()
        tracker._reference_time = 0.0
        tracker._last_relative = np.eye(4)
        tracker._settings = Settings(
            {"motion_compensation": {"enabled": True}}
        )

        rng = np.random.default_rng(7)
        t = 0.0
        for k in range(200):
            t += 0.2
            reg = np.eye(4)
            # a realistic per-call registration with the measured ~1.2e-4
            # scale inflation the TPU ICP used to emit pre-projection
            reg[:3, :3] = (
                _R.from_rotvec(rng.normal(0, 0.01, 3)).as_matrix() * 1.00012
            )
            reg[:3, 3] = rng.normal(0, 0.05, 3)
            dirs = rng.normal(size=(3, 64)).astype(np.float32)
            dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
            scan = LidarScan(
                dirs,
                rng.uniform(1, 10, 64).astype(np.float32),
                np.sort(rng.uniform(t - 0.05, t + 0.05, 64)),
            )
            frame = Frame(None, scan, None)
            tracker._apply_registration(frame, reg)

        r = tracker._reference_pose.matrix[:3, :3]
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-9)
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-9)
        # The per-frame pose written into the frame is also on-manifold.
        fr = frame.get_lidar_pose().matrix[:3, :3]
        assert np.linalg.det(fr) == pytest.approx(1.0, abs=1e-9)


class TestICPDevicePlacement:
    """`tracker.icp.device: k` pins the ICP stack to jax.devices()[k]
    (tracking/icp.py::run_icp_schedule device=). On a multi-chip host
    this removes tracker/mapper chip contention entirely — the
    structural latency floor measured in artifacts/track_latency_r4/.
    Runs here on the 8-device virtual CPU mesh from conftest."""

    def test_result_lands_on_requested_device_and_matches(self):
        import jax

        devices = jax.devices()
        assert len(devices) >= 2, "conftest provides 8 virtual devices"
        source, target, t_true = make_cloud_pair(
            np.array([0.15, 0.1, -0.05, 0.02, -0.01, 0.05])
        )
        res_default = run_icp_schedule(source, target, SCHEDULE, pad_size=4096)
        res_dev1 = run_icp_schedule(
            source, target, SCHEDULE, pad_size=4096, device=devices[1]
        )
        assert res_dev1.transformation.devices() == {devices[1]}
        np.testing.assert_allclose(
            np.asarray(res_dev1.transformation),
            np.asarray(res_default.transformation),
            atol=1e-6,
        )
        # Chained device init (the pipelined velocity chain) stays on
        # device 1 without an explicit re-put.
        res_chain = run_icp_schedule(
            source, target, SCHEDULE, pad_size=4096,
            init=res_dev1.transformation, device=devices[1],
        )
        assert res_chain.transformation.devices() == {devices[1]}
        err = Pose(np.asarray(res_chain.transformation, np.float64)).inv() * t_true
        d_t, d_r = Pose.identity().distance_to(err)
        assert d_t < 0.035 and d_r < 1.0

    @staticmethod
    def _make_tracker(icp_extra):
        from loner_tpu.common.settings import Settings
        from loner_tpu.common.signals import Signal
        from loner_tpu.tracking.tracker import Tracker

        icp = {
            "schedule": [dict(s) for s in SCHEDULE],
            "downsample": {"type": "UNIFORM", "target_uniform_point_count": 512},
            "scan_duration": 1,
            **icp_extra,
        }
        settings = Settings({
            "system": {"lidar_only": True},
            "calibration": {"lidar_to_camera": {"xyz": [0, 0, 0],
                                                "orientation": [0, 0, 0, 1]}},
            "tracker": {
                "icp": icp,
                "synchronization": {"enabled": False, "max_time_delta": 0.5},
                "frame_synthesis": {
                    "frame_decimation_rate_hz": 5,
                    "frame_match_tolerance": 0.01,
                    "frame_delta_t_sec_tolerance": 0.02,
                    "decimate_on_load": False,
                },
                "motion_compensation": {"enabled": False},
            },
        })
        return Tracker(settings, None, Signal(), Signal())

    def test_tracker_resolves_device_setting(self):
        import jax

        # in range -> pinned; absent -> default; out of range -> default
        assert self._make_tracker({"device": 1})._icp_device == jax.devices()[1]
        assert self._make_tracker({})._icp_device is None
        assert self._make_tracker({"device": 99})._icp_device is None
