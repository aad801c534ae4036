"""Unit tests for the map-quality metric stack.

These functions produced every published F-score/chamfer/L1 artifact
(reference analysis/evaluate_lidar_map.py:16-98 + compute_metrics/maps),
so their math is pinned here on analytic clouds with known answers.
"""
import os

import numpy as np
import pytest

from loner_tpu.analysis.evaluate_lidar_map import _nn_dists, evaluate_lidar_map


def _grid_cloud(n_side=20, spacing=0.2):
    """A flat n x n grid in z=0 — voxel-stable at voxel << spacing."""
    ax = np.arange(n_side) * spacing
    xx, yy = np.meshgrid(ax, ax)
    return np.stack(
        [xx.ravel(), yy.ravel(), np.zeros(n_side * n_side)], axis=-1
    ).astype(np.float32)


class TestNNDists:
    def test_exact_distances(self):
        ref = np.array([[0, 0, 0], [1, 0, 0]], np.float64)
        q = np.array([[0.1, 0, 0], [0.9, 0, 0], [0.5, 0.5, 0]], np.float64)
        d = _nn_dists(q, ref)
        np.testing.assert_allclose(d, [0.1, 0.1, np.sqrt(0.5)], atol=1e-12)


class TestEvaluateLidarMap:
    def test_identical_clouds_perfect_score(self, tmp_path):
        pts = _grid_cloud()
        stats = evaluate_lidar_map(
            pts, pts.copy(), voxel_size=0.05, refine_alignment=False,
            log_dir=str(tmp_path),
        )
        assert stats["accuracy"] == pytest.approx(0.0, abs=1e-9)
        assert stats["completion"] == pytest.approx(0.0, abs=1e-9)
        assert stats["f_score"] == pytest.approx(1.0)
        assert os.path.exists(tmp_path / "metrics" / "statistics.yaml")

    def test_known_offset_metrics(self):
        # Shift the whole estimated cloud by 0.05 m in z: every NN
        # distance is exactly 0.05, both directions.
        gt = _grid_cloud()
        est = gt + np.array([0.0, 0.0, 0.05], np.float32)
        stats = evaluate_lidar_map(
            est, gt, voxel_size=0.02, refine_alignment=False,
            f_score_threshold=0.1,
        )
        assert stats["accuracy"] == pytest.approx(0.05, abs=1e-6)
        assert stats["completion"] == pytest.approx(0.05, abs=1e-6)
        assert stats["chamfer"] == pytest.approx(0.10, abs=1e-6)
        assert stats["precision"] == 1.0 and stats["recall"] == 1.0

    def test_threshold_splits_precision(self):
        # Half the est points sit on GT, half 0.3 m away (> threshold).
        gt = _grid_cloud()
        far = gt[: len(gt) // 2] + np.array([0.0, 0.0, 0.3], np.float32)
        est = np.concatenate([gt[len(gt) // 2 :], far])
        stats = evaluate_lidar_map(
            est, gt, voxel_size=0.02, refine_alignment=False,
            f_score_threshold=0.1,
        )
        assert stats["precision"] == pytest.approx(0.5, abs=0.02)
        # recall: GT points near the matched half are covered.
        assert 0.3 < stats["recall"] <= 1.0

    def test_icp_refinement_recovers_small_misalignment(self):
        # A 2 cm translation must be absorbed by the alignment refine
        # (the reference ICP-refines before scoring, :39-53), yielding
        # near-perfect accuracy. Needs 3-D structure for ICP normals.
        rng = np.random.default_rng(0)
        gt = rng.uniform(0, 2, (2000, 3)).astype(np.float32)
        # project onto 3 box faces for surface-like structure
        gt[::3, 2] = 0.0
        gt[1::3, 0] = 0.0
        gt[2::3, 1] = 0.0
        est = gt + np.array([0.02, -0.015, 0.01], np.float32)
        stats = evaluate_lidar_map(
            est, gt, voxel_size=0.01, refine_alignment=True,
            f_score_threshold=0.1,
        )
        assert stats["accuracy"] < 0.02
        assert stats["f_score"] > 0.95


class TestMeshToPcd:
    def test_unit_square_sampling(self, tmp_path):
        from loner_tpu.analysis.mesh_to_pcd import mesh_to_pcd, read_ply
        from loner_tpu.analysis.mesher import write_ply

        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
        ply = str(tmp_path / "square.ply")
        write_ply(verts, faces, ply)

        rv, rf = read_ply(ply)
        np.testing.assert_allclose(rv, verts, atol=1e-5)
        np.testing.assert_array_equal(rf, faces)

        pts = mesh_to_pcd(ply, n_points=20000, voxel_size=0.05)
        assert pts.shape[1] == 3
        # All samples on the square, z == 0.
        assert np.abs(pts[:, 2]).max() < 1e-5
        assert pts[:, :2].min() >= -0.05 and pts[:, :2].max() <= 1.05
        # Voxel downsampling at 0.05 over a unit square: ~400 cells.
        assert 200 <= len(pts) <= 600


class TestPlotPoses:
    def test_writes_png(self, tmp_path):
        # Minimal fake experiment: checkpoint with twist pose states +
        # pickled full config (the loader contract).
        import pickle

        from loner_tpu.analysis.plot_poses import plot_poses

        log_dir = str(tmp_path / "exp")
        os.makedirs(os.path.join(log_dir, "checkpoints"))
        poses = []
        for i in range(4):
            tw = np.zeros(6, np.float64)
            tw[0] = 0.5 * i
            poses.append(
                {
                    "timestamp": float(i),
                    "lidar_pose": tw,
                    "gt_lidar_pose": tw + 0.01,
                    "tracked_pose": tw,
                }
            )
        ckpt = {
            "poses": poses,
            "network_state_dict": {},
            "occ_model_state_dict": None,
            "global_step": 0,
            "world_cube": {"scale_factor": 1.0, "shift": np.zeros(3)},
        }
        with open(os.path.join(log_dir, "checkpoints", "final.tar"), "wb") as f:
            pickle.dump(ckpt, f)
        cfg = {
            "mapper": {
                "optimizer": {
                    "model_config": {
                        "data": {"ray_range": [1.0, 10.0]},
                        "model": {
                            "num_colors": 1,
                            "render": {"N_samples_train": 16},
                            "occ_model": {"voxel_size": 8},
                            "nerf_config": {
                                "pos_encoding_sigma": {},
                                "pos_encoding_intensity": {},
                                "sigma_network": {
                                    "n_neurons": 16,
                                    "n_hidden_layers": 1,
                                },
                                "intensity_network": {
                                    "n_neurons": 16,
                                    "n_hidden_layers": 1,
                                },
                            },
                        },
                    }
                }
            }
        }
        with open(os.path.join(log_dir, "full_config.pkl"), "wb") as f:
            pickle.dump(cfg, f)
        out = plot_poses(log_dir)
        assert os.path.exists(out) and os.path.getsize(out) > 1000
