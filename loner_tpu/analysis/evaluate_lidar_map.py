"""Map-quality metrics: estimated vs ground-truth point cloud.

TPU-native counterpart of analysis/evaluate_lidar_map.py (reference
:16-148): voxel-downsample both clouds, ICP-refine the alignment, then
compute accuracy / completion / chamfer and precision / recall / F-score
at a threshold (0.1 m default), writing ``metrics/statistics.yaml``.
Nearest-neighbor distances run on device (the same MXU distance-matrix
kernel as the tracker's ICP), chunked to bound memory.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import yaml

from loner_tpu.ops.voxel import voxel_downsample
from loner_tpu.tracking.icp import run_icp_schedule


def _nn_dists(query: np.ndarray, ref: np.ndarray, chunk: int = 4096) -> np.ndarray:
    """For each query point, distance to the nearest ref point (meters).

    KD-tree on the host: map-scale clouds (hundreds of thousands of
    points) make the O(N*M) device distance matrix — ~100 dispatches of
    4096 x M matmuls over the tunnel — slower than a single cKDTree
    build+query, and this tool often runs on CPU-only hosts anyway."""
    from scipy.spatial import cKDTree

    tree = cKDTree(np.asarray(ref, np.float64))
    d, _ = tree.query(np.asarray(query, np.float64), k=1)
    return d.astype(np.float64)


def evaluate_lidar_map(
    est_points: np.ndarray,
    gt_points: np.ndarray,
    voxel_size: float = 0.05,
    f_score_threshold: float = 0.1,
    refine_alignment: bool = True,
    log_dir: Optional[str] = None,
) -> dict:
    est = voxel_downsample(est_points, voxel_size)
    gt = voxel_downsample(gt_points, voxel_size)

    if refine_alignment:
        result = run_icp_schedule(
            est,
            gt,
            [{"threshold": 0.5, "max_iterations": 20}, {"threshold": 0.1, "max_iterations": 20}],
            pad_size=8192,
        )
        t = np.asarray(result.transformation, np.float64)
        est = est @ t[:3, :3].T + t[:3, 3]

    d_est_to_gt = _nn_dists(est, gt)  # accuracy
    d_gt_to_est = _nn_dists(gt, est)  # completion

    accuracy = float(d_est_to_gt.mean())
    completion = float(d_gt_to_est.mean())
    chamfer = accuracy + completion
    precision = float((d_est_to_gt < f_score_threshold).mean())
    recall = float((d_gt_to_est < f_score_threshold).mean())
    f_score = (
        2 * precision * recall / (precision + recall) if precision + recall > 0 else 0.0
    )

    stats = {
        "accuracy": accuracy,
        "completion": completion,
        "chamfer": chamfer,
        "precision": precision,
        "recall": recall,
        "f_score": f_score,
        "threshold": f_score_threshold,
        "num_est_points": int(est.shape[0]),
        "num_gt_points": int(gt.shape[0]),
    }
    if log_dir is not None:
        os.makedirs(os.path.join(log_dir, "metrics"), exist_ok=True)
        with open(os.path.join(log_dir, "metrics", "statistics.yaml"), "w") as f:
            yaml.safe_dump(stats, f)
    return stats


if __name__ == "__main__":
    import argparse

    from loner_tpu.analysis.renderer_lidar import read_pcd

    p = argparse.ArgumentParser(description="Map accuracy/completion metrics")
    p.add_argument("estimated_map", help=".pcd or .npy point cloud")
    p.add_argument("groundtruth_map", help=".pcd or .npy point cloud")
    p.add_argument("--voxel_size", type=float, default=0.05)
    p.add_argument("--threshold", type=float, default=0.1)
    p.add_argument("--log_dir", default=None)
    args = p.parse_args()

    def load(path):
        return np.load(path) if path.endswith(".npy") else read_pcd(path)

    stats = evaluate_lidar_map(
        load(args.estimated_map),
        load(args.groundtruth_map),
        voxel_size=args.voxel_size,
        f_score_threshold=args.threshold,
        log_dir=args.log_dir,
    )
    print(yaml.safe_dump(stats))
