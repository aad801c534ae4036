"""Debug artifact dumps: point clouds, rays, loss curves, loss plots.

TPU-native counterpart of the reference's flag-gated debug dumps
(SURVEY §4.5): ``write_frame_point_clouds`` (tracker.py:126-137),
``write_ray_point_clouds`` (optimizer.py:307-312), ``log_losses``
(optimizer.py:412-424), and ``visualize_loss`` (optimizer.py:628-723).
All writers are plain-Python/ASCII so the artifacts open anywhere.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def write_pcd_xyz(points: np.ndarray, fname: str) -> None:
    from loner_tpu.analysis.renderer_lidar import write_pcd

    os.makedirs(os.path.dirname(fname), exist_ok=True)
    write_pcd(np.asarray(points, np.float32).reshape(-1, 3), fname)


def rays_to_points(rays: np.ndarray, depths: np.ndarray, world_cube=None) -> np.ndarray:
    """LONER-format rays + depths -> end points (world meters if cube given)
    (reference ray_utils.py:228-248)."""
    origins, dirs = rays[:, :3], rays[:, 3:6]
    pts = origins + dirs * depths[:, None]
    if world_cube is not None:
        pts = pts * world_cube.scale_factor - world_cube.shift
    return pts


def dump_frame_point_cloud(frame, log_directory: str, frame_idx: int) -> None:
    """write_frame_point_clouds flag (reference tracker.py:126-137)."""
    pts = frame.build_point_cloud()
    write_pcd_xyz(pts, os.path.join(log_directory, "frames", f"cloud_{frame_idx}.pcd"))
    if frame.lidar_points.sky_rays is not None and frame.lidar_points.sky_rays.size:
        sky = frame.lidar_points.get_sky_scan(100.0)
        write_pcd_xyz(
            sky.end_points(),
            os.path.join(log_directory, "frames", f"cloud_{frame_idx}_sky.pcd"),
        )


def dump_ray_point_cloud(
    rays: np.ndarray, depths: np.ndarray, log_directory: str, tag: str, world_cube=None
) -> None:
    """write_ray_point_clouds flag (reference optimizer.py:307-312)."""
    pts = rays_to_points(rays, depths, world_cube)
    write_pcd_xyz(pts, os.path.join(log_directory, "rays", f"{tag}_rays.pcd"))
    write_pcd_xyz(rays[:, :3], os.path.join(log_directory, "rays", f"{tag}_origins.pcd"))


def log_losses(
    losses: np.ndarray,
    depth_eps: np.ndarray,
    log_directory: str,
    keyframe_count: int,
    phase_idx: int,
) -> None:
    """log_losses flag: per-phase CSVs (reference optimizer.py:412-424)."""
    d = os.path.join(log_directory, "losses", f"keyframe_{keyframe_count}")
    os.makedirs(d, exist_ok=True)
    np.savetxt(os.path.join(d, f"phase_{phase_idx}.csv"), np.asarray(losses))
    d = os.path.join(log_directory, "depth_eps", f"keyframe_{keyframe_count}")
    os.makedirs(d, exist_ok=True)
    np.savetxt(os.path.join(d, f"phase_{phase_idx}.csv"), np.asarray(depth_eps))


def visualize_loss(
    z_vals_m: np.ndarray,
    weights_pred: np.ndarray,
    weights_gt: np.ndarray,
    depth_gt_m: float,
    eps: float,
    eps_min: float,
    log_directory: str,
    global_step: int,
    ray_idx: int = 0,
) -> Optional[str]:
    """Plot one ray's predicted vs target weight distribution
    (visualize_loss flag, reference optimizer.py:628-723)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy.stats import norm

    x = np.asarray(z_vals_m[ray_idx])
    y = np.asarray(weights_pred[ray_idx])
    x_axis = np.linspace(x.min(), x.max(), 400)

    def normed(pdf):
        m = pdf.max()
        return pdf / m if m > 1 else pdf

    plt.figure(figsize=(10, 6))
    plt.plot(x_axis, normed(norm.pdf(x_axis, depth_gt_m, eps)), color="#ef8600",
             lw=3, label=f"LOS target (eps={eps:.2f})")
    plt.plot(x_axis, normed(norm.pdf(x_axis, depth_gt_m, eps_min)), color="#00b050",
             lw=2, label="goal (eps_min)")
    plt.plot(x, y, ".", ms=6, color="#0070c0", label="predicted weights")
    plt.plot(x, np.asarray(weights_gt[ray_idx]), "x", ms=4, color="#7d2dc8",
             label="target weights")
    plt.axvline(depth_gt_m, color="k", ls="--", lw=1)
    plt.xlabel("Dist. (m)")
    plt.ylabel("Weight")
    plt.ylim([0, 1])
    plt.legend()
    out_dir = os.path.join(log_directory, "viz_loss")
    os.makedirs(out_dir, exist_ok=True)
    fname = os.path.join(out_dir, f"iter_{global_step}.png")
    plt.savefig(fname, dpi=100, bbox_inches="tight")
    plt.close()
    return fname
