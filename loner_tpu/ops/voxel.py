"""Point-cloud downsampling ops.

Replaces Open3D's voxel_down_sample / uniform sampling used by the
reference tracker and map evaluation (src/tracking/tracker.py:169-184,
analysis/evaluate_lidar_map.py). Voxel hashing runs host-side in numpy
(the tracker calls it at frame rate on ~1e5 points — microseconds); a
jittable variant is unnecessary because the result feeds the padded ICP
buffers anyway.
"""
from __future__ import annotations

import numpy as np


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Average all points that fall into the same voxel (Open3D semantics)."""
    pts = np.asarray(points, np.float64)
    if pts.shape[0] == 0:
        return pts.astype(np.float32)
    keys = np.floor(pts / voxel_size).astype(np.int64)
    # Unique voxel per row via lexicographic unique.
    _, inverse, counts = np.unique(
        keys, axis=0, return_inverse=True, return_counts=True
    )
    sums = np.zeros((counts.shape[0], 3), np.float64)
    np.add.at(sums, inverse, pts)
    return (sums / counts[:, None]).astype(np.float32)


def uniform_downsample(points: np.ndarray, every_k: int) -> np.ndarray:
    """Keep every k-th point (Open3D uniform_down_sample semantics)."""
    return np.asarray(points)[::every_k]


def random_downsample(points: np.ndarray, target: int, seed: int = 0) -> np.ndarray:
    pts = np.asarray(points)
    if pts.shape[0] <= target:
        return pts
    idx = np.random.default_rng(seed).choice(pts.shape[0], target, replace=False)
    return pts[idx]
