"""Golden tests for the native ATE/RPE implementation (evo replacement)."""
import os
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as _R

from loner_tpu.analysis.traj_metrics import (
    associate,
    ate,
    rpe,
    umeyama_alignment,
)


def make_traj(n=50, step=0.5):
    """Straight-line trajectory with yaw."""
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * step
    poses[:, :3, :3] = _R.from_euler("z", (np.arange(n) * 0.01).reshape(-1, 1)).as_matrix()
    ts = 100.0 + np.arange(n) * 0.1
    return poses, ts


class TestAssociation:
    def test_exact_match(self):
        a = np.array([1.0, 2.0, 3.0])
        b = np.array([1.0, 2.0, 3.0, 4.0])
        ia, ib = associate(a, b)
        np.testing.assert_array_equal(ia, [0, 1, 2])
        np.testing.assert_array_equal(ib, [0, 1, 2])

    def test_tolerance_rejects(self):
        a = np.array([1.0, 2.5])
        b = np.array([1.005, 2.0])
        ia, ib = associate(a, b, max_diff=0.02)
        np.testing.assert_array_equal(ia, [0])


class TestUmeyama:
    def test_recovers_rigid_transform(self):
        rng = np.random.default_rng(0)
        src = rng.normal(size=(100, 3))
        rot = _R.from_rotvec([0.2, -0.1, 0.4]).as_matrix()
        t = np.array([1.0, -2.0, 0.5])
        dst = src @ rot.T + t
        m = umeyama_alignment(src, dst)
        np.testing.assert_allclose(m[:3, :3], rot, atol=1e-9)
        np.testing.assert_allclose(m[:3, 3], t, atol=1e-9)


class TestATE:
    def test_identical_zero(self):
        poses, ts = make_traj()
        res = ate(poses, ts, poses, ts)
        assert res.rmse == pytest.approx(0.0, abs=1e-9)

    def test_alignment_removes_rigid_offset(self):
        poses, ts = make_traj()
        offset = np.eye(4)
        offset[:3, 3] = [5.0, -3.0, 1.0]
        offset[:3, :3] = _R.from_euler("z", [[0.3]]).as_matrix()[0]
        shifted = offset[None] @ poses
        res = ate(shifted, ts, poses, ts, align=True)
        assert res.rmse == pytest.approx(0.0, abs=1e-9)
        res_noalign = ate(shifted, ts, poses, ts, align=False)
        assert res_noalign.rmse > 1.0

    def test_known_noise_level(self):
        poses, ts = make_traj()
        noisy = poses.copy()
        noisy[:, 0, 3] += 0.1  # constant x offset -> removed by alignment
        noisy[::2, 1, 3] += 0.2  # alternating y: not removable
        res = ate(noisy, ts, poses, ts, align=True)
        assert res.rmse == pytest.approx(0.1, abs=0.02)


class TestRPE:
    def test_identical_zero(self):
        poses, ts = make_traj()
        res = rpe(poses, ts, poses, ts, delta_m=3.0)
        assert res.rmse == pytest.approx(0.0, abs=1e-9)

    def test_drift_detected(self):
        poses, ts = make_traj(step=0.5)
        drifted = poses.copy()
        # 1% scale drift in x.
        drifted[:, 0, 3] *= 1.01
        res = rpe(drifted, ts, poses, ts, delta_m=3.0)
        # Each ~3 m segment drifts ~3 cm.
        assert res.mean == pytest.approx(0.03, abs=0.01)

    def test_rotation_rpe(self):
        poses, ts = make_traj()
        twisted = poses.copy()
        # Constant extra yaw per pose compounds across segments.
        extra = _R.from_euler("z", [[0.005]]).as_matrix()[0]
        for i in range(len(poses)):
            twisted[i, :3, :3] = np.linalg.matrix_power(extra, i) @ poses[i, :3, :3]
        res = rpe(twisted, ts, poses, ts, delta_m=3.0, rotation=True)
        # 6 poses per 3 m -> ~0.03 rad = 1.7 deg per segment.
        assert res.mean == pytest.approx(np.rad2deg(0.03), rel=0.3)


def test_mask_gt_with_trajectory(tmp_path):
    """GT-map masking keeps exactly the points near the reconstruction
    (reference examples/fusion_portable/mask_gt_with_trajectory.py)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from mask_gt_with_trajectory import mask_gt_map

    rng = np.random.default_rng(0)
    rec = rng.uniform(-1, 1, (500, 3))
    near = rec[:200] + rng.normal(0, 0.01, (200, 3))   # within 0.1 m
    far = rec[:100] + np.array([5.0, 0.0, 0.0])        # far away
    gt = np.concatenate([near, far])
    masked = mask_gt_map(gt, rec, dist_threshold=0.1)
    np.testing.assert_allclose(masked, near)

    # merged_transform re-poses the reconstruction before masking.
    tf = np.eye(4)
    tf[:3, 3] = [5.0, 0.0, 0.0]
    masked_tf = mask_gt_map(gt, rec[:100], dist_threshold=0.1, transform=tf)
    np.testing.assert_allclose(masked_tf, far)


class TestMetricsPipeline:
    """summarize_results RPE columns + the regression.yaml record."""

    def _make_experiment(self, tmp_path, n_trials=2):
        from loner_tpu.common.trajectory import dump_trajectory_to_tum

        exp = tmp_path / "exp"
        poses, ts = make_traj(40)
        for j in range(n_trials):
            traj = exp / f"trial_{j}" / "trajectory"
            traj.mkdir(parents=True)
            noisy = poses.copy()
            rng = np.random.default_rng(j)
            noisy[:, :3, 3] += rng.normal(0, 0.01, (len(poses), 3))
            dump_trajectory_to_tum(noisy, ts, str(traj / "estimated_trajectory.txt"))
            dump_trajectory_to_tum(poses, ts, str(traj / "groundtruth.txt"))
            metrics = exp / f"trial_{j}" / "metrics"
            metrics.mkdir()
            (metrics / "statistics.yaml").write_text(
                "f_score: 0.9\nchamfer: 0.08\naccuracy: 0.03\ncompletion: 0.05\n"
            )
            (metrics / "l1.yaml").write_text("mean: 0.15\nrmse: 0.4\nmin: 0.0\nmax: 2.0\n")
        return str(exp)

    def test_summary_has_rpe_columns(self, tmp_path):
        from loner_tpu.analysis.metrics_pipeline import (
            analyze_trajectories,
            summarize_results,
        )

        exp = self._make_experiment(tmp_path)
        results = analyze_trajectories(exp)
        csv = summarize_results(results)
        header = csv.splitlines()[0].split(",")
        assert "rpe_trans_rmse_mean" in header
        assert "rpe_rot_rmse_mean_deg" in header
        row = csv.splitlines()[1].split(",")
        # per-pose noise survives alignment; RPE over 3 m windows stays small
        assert float(row[header.index("ate_rmse_mean")]) > 0.005
        assert float(row[header.index("rpe_trans_rmse_mean")]) < 0.1

    def test_regression_file_schema_and_determinism(self, tmp_path):
        import yaml as _yaml

        from loner_tpu.analysis.metrics_pipeline import write_regression_file

        exp = self._make_experiment(tmp_path)
        rec = write_regression_file(exp)
        assert os.path.exists(os.path.join(exp, "regression.yaml"))
        assert rec["schema"] == 1 and rec["num_trials"] == 2
        t0 = rec["trials"]["trial_0"]
        for key in (
            "ate_rmse", "rpe_trans_rmse", "rpe_rot_rmse_deg",
            "map_f_score", "map_chamfer", "l1_mean", "l1_rmse",
        ):
            assert key in t0, key
        assert t0["map_f_score"] == 0.9
        assert "ate_rmse_mean" in rec["aggregate"]
        # determinism: a second write is byte-identical (diff-stable record)
        first = open(os.path.join(exp, "regression.yaml")).read()
        write_regression_file(exp)
        assert open(os.path.join(exp, "regression.yaml")).read() == first
        # and it round-trips through yaml
        assert _yaml.safe_load(first)["trials"]["trial_0"]["ate_rmse"] == t0["ate_rmse"]
