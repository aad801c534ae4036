"""End-to-end SLAM integration test: tracking + mapping on a synthetic
loop, single-threaded deterministic mode (the reference's determinism
harness, loner.py:254-261), tiny scale for the 1-core CPU host.

Validates: the full pipeline runs through the public Loner API, produces
the trajectory/checkpoint artifact contract, and the estimated trajectory
ATE is small on the analytic scene.
"""
import os

import numpy as np
import pytest

from loner_tpu.common.settings import Settings
from loner_tpu.analysis.traj_metrics import evaluate_trajectory_files
from loner_tpu.datasets.scan_stream import ScanStreamWriter
from loner_tpu.datasets.synthetic import VirtualLidar, generate_sequence

# Suite tier (tests/conftest.py): full-pipeline drive, >30 s on CPU.
pytestmark = [pytest.mark.slow, pytest.mark.e2e]


NUM_SCANS = 24


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ds"))
    scans, poses, ts, scene, lidar = generate_sequence(
        num_scans=NUM_SCANS,
        lidar=VirtualLidar(num_channels=16, num_columns=128, max_range=30.0),
        rate_hz=5.0,
    )
    w = ScanStreamWriter(root)
    for s in scans:
        w.add_scan(s)
    w.write_gt(poses, ts)
    return root


def tiny_settings(log_prefix: str) -> Settings:
    s = Settings.load_from_file("cfg/defaults.yaml")
    s.augment(
        {
            "system": {"single_threaded": True, "log_dir_prefix": log_prefix},
            "tracker": {
                "frame_synthesis": {"frame_decimation_rate_hz": 2.5, "decimate_on_load": False},
                "icp": {"downsample": {"target_uniform_point_count": 1500}},
            },
            "mapper": {
                "keyframe_manager": {
                    "keyframe_selection": {"temporal": {"time_diff_seconds": 1.0}},
                    "window_selection": {"window_size": 3},
                },
                "optimizer": {
                    "num_samples": {"lidar": 128, "sky": 0},
                    "keyframe_schedule": [
                        {
                            "num_keyframes": 1,
                            "iteration_schedule": [
                                {
                                    "num_iterations": 70,
                                    "freeze_poses": True,
                                    "freeze_sigma_mlp": False,
                                    "freeze_rgb_mlp": True,
                                }
                            ],
                        },
                        {
                            "num_keyframes": -1,
                            "iteration_schedule": [
                                {
                                    "num_iterations": 20,
                                    "freeze_poses": False,
                                    "freeze_sigma_mlp": False,
                                    "freeze_rgb_mlp": True,
                                }
                            ],
                        },
                    ],
                    "model_config": {
                        "data": {"ray_range": [0.5, 14.0]},
                        "model": {
                            "ray_range": [0.5, 14.0],
                            "render": {"N_samples_train": 64, "N_samples_test": 128},
                            "occ_model": {"voxel_size": 32},
                            "nerf_config": {
                                "pos_encoding_sigma": {
                                    "n_levels": 6,
                                    "log2_hashmap_size": 14,
                                    "per_level_scale": 1.5,
                                },
                                "pos_encoding_intensity": {
                                    "n_levels": 2,
                                    "log2_hashmap_size": 12,
                                },
                            },
                        },
                    },
                },
            },
        }
    )
    return s


@pytest.fixture(scope="module")
def slam_run(synthetic_dataset, tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from run_loner import run_trial

    log_prefix = str(tmp_path_factory.mktemp("outputs"))
    settings = tiny_settings(log_prefix)
    log_dir = run_trial(settings, synthetic_dataset, experiment_name="e2e_test")
    return log_dir


class TestEndToEnd:
    def test_artifacts_exist(self, slam_run):
        for f in [
            "world_cube.yaml",
            "full_config.yaml",
            "full_config.pkl",
            "runtime.txt",
            "trajectory/tracking_only.txt",
            "trajectory/online_estimates.txt",
            "trajectory/keyframe_trajectory.txt",
            "trajectory/estimated_trajectory.txt",
            "trajectory/groundtruth.txt",
            "checkpoints/final.tar",
        ]:
            assert os.path.exists(os.path.join(slam_run, f)), f

    def test_trajectory_ate(self, slam_run):
        res = evaluate_trajectory_files(
            os.path.join(slam_run, "trajectory", "estimated_trajectory.txt"),
            os.path.join(slam_run, "trajectory", "groundtruth.txt"),
            delta_m=1.0,
        )
        # Analytic scene, short loop: tracking should be centimeter-level.
        assert res["ate"]["rmse"] < 0.15, res["ate"]

    def test_tracking_only_ate(self, slam_run):
        res = evaluate_trajectory_files(
            os.path.join(slam_run, "trajectory", "tracking_only.txt"),
            os.path.join(slam_run, "trajectory", "groundtruth.txt"),
            delta_m=1.0,
        )
        assert res["ate"]["rmse"] < 0.15, res["ate"]

    def test_checkpoint_loadable_and_renders(self, slam_run):
        from loner_tpu.analysis.render_utils import load_experiment, render_depth_chunked
        from loner_tpu.analysis.render_utils import kf_pose_matrices

        model = load_experiment(slam_run)
        assert len(model.poses) >= 3
        mats, ts = kf_pose_matrices(model)
        dirs = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
        origins = np.broadcast_to(mats[0][:3, 3], dirs.shape)
        out = render_depth_chunked(
            model, origins, dirs, (0.5, 14.0), n_samples=128, ret_var=True
        )
        assert np.all(np.isfinite(out["depth"]))

    def test_peak_depth_consistency_render(self, slam_run):
        """Peak-depth consistency |z@argmax(w) - expected depth| in
        meters (reference renderer.py:197-203): finite, non-negative,
        and small on a well-trained wall-facing ray."""
        from loner_tpu.analysis.render_utils import (
            kf_pose_matrices,
            load_experiment,
            render_depth_chunked,
        )

        model = load_experiment(slam_run)
        mats, _ = kf_pose_matrices(model)
        dirs = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]], np.float32)
        origins = np.broadcast_to(mats[0][:3, 3], dirs.shape)
        out = render_depth_chunked(
            model, origins, dirs, (0.5, 14.0), n_samples=128,
            ret_var=True, with_peak=True,
        )
        peak = out["peak_depth_consistency"]
        assert peak.shape == (3,)
        assert np.all(np.isfinite(peak)) and np.all(peak >= 0)
        # For a converged unimodal surface the peak sample should sit
        # within a couple of sample bins of the expected depth.
        assert peak.min() < 1.0, peak

    def test_render_along_tum_trajectory(self, slam_run, tmp_path):
        """--traj equivalent (reference renderer.py:71): render along an
        arbitrary TUM file instead of keyframe poses."""
        from loner_tpu.analysis.renderer import render_sequence

        traj = os.path.join(slam_run, "trajectory", "estimated_trajectory.txt")
        n_lines = sum(1 for _ in open(traj))
        out = render_sequence(
            slam_run, width=16, height=8, n_samples=32, skip_step=2,
            traj_file=traj, out_dir=str(tmp_path / "traj"),
        )
        n_frames = len([f for f in os.listdir(out) if f.endswith(".npy")])
        assert n_frames == -(-n_lines // 2)

    def test_flythrough_frames_and_manifest(self, slam_run):
        from loner_tpu.analysis.renderer import render_flythrough

        out = render_flythrough(
            slam_run, width=32, height=16, steps_between=1, spin_every=0,
            n_samples=32,
        )
        frames = open(os.path.join(out, "frames.txt")).read().split()
        assert len(frames) >= 3
        for f in frames:
            assert os.path.exists(os.path.join(out, f))
        assert "ffmpeg" in open(os.path.join(out, "make_video.sh")).read()

    def test_l1_depth_metric_pipeline(self, slam_run, synthetic_dataset):
        from loner_tpu.analysis.compute_l1_depth import compute_l1_depth

        res = compute_l1_depth(
            slam_run,
            synthetic_dataset,
            num_frames=3,
            rays_per_frame=256,
            n_samples=128,
        )
        assert os.path.exists(os.path.join(slam_run, "metrics", "l1.yaml"))
        # Regression threshold at fixture scale (minimal iteration budget;
        # a few occlusion outlier rays dominate the mean — observed ~2.7).
        # The credible L1 record is the on-chip drive artifact
        # (outputs/tpu_drive_r2b/metrics/l1.yaml, docs/TPU_NATIVE.md).
        assert res["mean"] < 3.0, res


class TestEndToEndMesh:
    """Full SLAM through the public Loner API with the mapping
    optimization sharded over the 8-device virtual mesh
    (system.mesh_devices) — the production multi-chip path, not a
    hand-assembled runner."""

    @pytest.fixture(scope="class")
    def mesh_slam_run(self, synthetic_dataset, tmp_path_factory):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
        from run_loner import run_trial

        log_prefix = str(tmp_path_factory.mktemp("outputs_mesh"))
        settings = tiny_settings(log_prefix)
        settings.augment(
            {
                "system": {"mesh_devices": 8},
                # The slot axis shards over the mesh: window width must be
                # a multiple of the mesh size.
                "mapper": {
                    "keyframe_manager": {"window_selection": {"window_size": 8}}
                },
            }
        )
        return run_trial(settings, synthetic_dataset, experiment_name="e2e_mesh")

    def test_mesh_trajectory_ate(self, mesh_slam_run):
        res = evaluate_trajectory_files(
            os.path.join(mesh_slam_run, "trajectory", "estimated_trajectory.txt"),
            os.path.join(mesh_slam_run, "trajectory", "groundtruth.txt"),
            delta_m=1.0,
        )
        # Same quality bar as the single-device run: sharding must be
        # semantically a no-op.
        assert res["ate"]["rmse"] < 0.15, res["ate"]

    def test_mesh_artifacts_exist(self, mesh_slam_run):
        for f in [
            "trajectory/estimated_trajectory.txt",
            "checkpoints/final.tar",
        ]:
            assert os.path.exists(os.path.join(mesh_slam_run, f)), f


class TestEndToEndTrackerDevice:
    """Full SLAM with the tracker's ICP pinned to a second device
    (tracker.icp.device: 1) while the mapper keeps device 0 — the
    multi-chip deployment split that removes tracker/mapper chip
    contention (artifacts/track_latency_r4/ measures the single-chip
    floor it eliminates). Sharded here over the virtual CPU devices."""

    @pytest.fixture(scope="class")
    def split_slam_run(self, synthetic_dataset, tmp_path_factory):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
        from run_loner import run_trial

        log_prefix = str(tmp_path_factory.mktemp("outputs_trkdev"))
        settings = tiny_settings(log_prefix)
        settings.augment({"tracker": {"icp": {"device": 1}}})
        return run_trial(settings, synthetic_dataset, experiment_name="e2e_trkdev")

    def test_trajectory_ate_matches_single_device(self, split_slam_run):
        res = evaluate_trajectory_files(
            os.path.join(split_slam_run, "trajectory", "estimated_trajectory.txt"),
            os.path.join(split_slam_run, "trajectory", "groundtruth.txt"),
            delta_m=1.0,
        )
        # Device placement must be semantically a no-op.
        assert res["ate"]["rmse"] < 0.15, res["ate"]

    def test_artifacts_exist(self, split_slam_run):
        for f in [
            "trajectory/estimated_trajectory.txt",
            "checkpoints/final.tar",
        ]:
            assert os.path.exists(os.path.join(split_slam_run, f)), f
