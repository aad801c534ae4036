#!/usr/bin/env python3
"""Mask a ground-truth map to the region actually observed by a run.

Counterpart of the reference's GT-map post-processing tool
(examples/fusion_portable/mask_gt_with_trajectory.py:69-121): keeps only
the GT-map points within DIST_THRESHOLD (0.1 m) of the reconstructed map,
so map-quality metrics (completion, F-score) are computed over the
lidar-visible region instead of penalizing geometry the sensor never saw.

The reference uses Open3D's C++ KD-tree (compute_point_cloud_distance);
here the nearest-neighbor distances come from scipy's cKDTree — this is
an offline host-side tool, not a compute-path component.

Usage:
    python examples/mask_gt_with_trajectory.py gt_map.pcd \
        reconstructed_map.pcd out_masked.pcd \
        [--dist_threshold 0.1] [--merged_transform t00 t01 ... t33]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scipy.spatial import cKDTree

from loner_tpu.analysis.renderer_lidar import read_pcd, write_pcd

DIST_THRESHOLD = 0.1  # meters (reference mask_gt_with_trajectory.py:46)


def mask_gt_map(
    gt_points: np.ndarray,
    reconstructed_points: np.ndarray,
    dist_threshold: float = DIST_THRESHOLD,
    transform: np.ndarray = None,
) -> np.ndarray:
    """GT points within ``dist_threshold`` of the reconstructed cloud
    (reference :92-98). ``transform`` optionally re-poses the
    reconstruction first (the --merged_transform option, :75-87)."""
    rec = np.asarray(reconstructed_points, np.float64)
    if transform is not None:
        rec = rec @ np.asarray(transform)[:3, :3].T + np.asarray(transform)[:3, 3]
    dists, _ = cKDTree(rec).query(np.asarray(gt_points, np.float64))
    return np.asarray(gt_points)[dists < dist_threshold]


def main() -> None:
    p = argparse.ArgumentParser(description="Mask GT map by reconstruction")
    p.add_argument("groundtruth_map", help="GT map .pcd (create_lidar_map.py)")
    p.add_argument("reconstructed_map", help=".pcd from renderer_lidar / mesh_to_pcd")
    p.add_argument("output", help="output masked .pcd path")
    p.add_argument("--dist_threshold", type=float, default=DIST_THRESHOLD)
    p.add_argument(
        "--merged_transform", type=float, nargs=16, default=None,
        help="row-major 4x4 applied to the reconstruction before masking",
    )
    args = p.parse_args()

    gt = read_pcd(args.groundtruth_map)
    rec = read_pcd(args.reconstructed_map)
    tf = (
        None
        if args.merged_transform is None
        else np.array(args.merged_transform).reshape(4, 4)
    )
    masked = mask_gt_map(gt, rec, args.dist_threshold, tf)
    write_pcd(masked.astype(np.float32), args.output)
    print(
        f"Masked GT map: kept {masked.shape[0]}/{gt.shape[0]} points "
        f"-> {args.output}"
    )


if __name__ == "__main__":
    main()
