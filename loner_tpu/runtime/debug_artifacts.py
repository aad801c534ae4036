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


def dump_iteration_ray_record(
    extras_log: list,
    log_directory: str,
    keyframe_count: int,
    n_lidar: int,
    n_sky: int,
    window_slots: int,
    num_kfs: int,
    world_scale: float,
    world_shift: np.ndarray,
    eps_min: float,
    js_alpha: float,
    max_js_score: float,
    store_ray: bool = False,
    draw_samples: bool = False,
    draw_rays_eps: bool = False,
) -> None:
    """Per-iteration ray/sample debug dumps for one keyframe optimization.

    ``extras_log`` is a list of per-dispatch records with leading iteration
    axes (see Optimizer). Reproduces the reference's three debug products:

    * ``store_ray`` (optimizer.py:393-410): accumulated sampled rays over
      ALL iterations -> rays/lidar/kf_N.pcd, plus per-ray sky/current-kf
      masks and the per-iteration std / JS records as .npy (the reference
      saves torch .pt tensors; same content).
    * ``draw_samples`` (optimizer.py:540-557): per-iteration sample points
      with predicted/target weights > 1e-5 -> samples/samples_kfK_itI.pcd.
    * ``draw_rays_eps`` (optimizer.py:559-566): per-iteration rays colored
      by normalized dynamic margin -> rays_eps/rays_kfK_itI.pcd.

    Iteration indices run sequentially across the keyframe's phases.
    """
    rays = np.concatenate([r["rays"] for r in extras_log])  # (T, B, 11)
    depths = np.concatenate([r["depths_cube"] for r in extras_log])
    std = np.concatenate([r["std"] for r in extras_log])
    js = np.concatenate([r["js"] for r in extras_log])
    valid = np.concatenate([r["valid"] for r in extras_log]).astype(bool)
    t, b = depths.shape

    # Batch layout: window_slots chunks of (n_lidar + n_sky) rays.
    per_slot = n_lidar + n_sky
    slot = np.arange(b) // per_slot
    in_slot = np.arange(b) % per_slot
    sky_mask = np.broadcast_to(in_slot >= n_lidar, (t, b))
    curr_mask = np.broadcast_to(slot == num_kfs - 1, (t, b))

    if store_ray:
        v = valid.reshape(-1)
        flat_rays = rays.reshape(-1, 11)[v]
        flat_depths = depths.reshape(-1)[v]
        pts = flat_rays[:, :3] + flat_rays[:, 3:6] * flat_depths[:, None]
        pts = pts * world_scale - world_shift
        write_pcd_xyz(
            pts, os.path.join(log_directory, "rays", "lidar", f"kf_{keyframe_count}.pcd")
        )
        for name, arr in (
            ("sky_mask", sky_mask.reshape(-1)[v]),
            ("curr_mask", curr_mask.reshape(-1)[v]),
            ("std", std.reshape(-1)[v]),
            ("js", js.reshape(-1)[v]),
        ):
            d = os.path.join(log_directory, "rays", name)
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, f"kf_{keyframe_count}.npy"), arr)

    if draw_samples and "points" in extras_log[0]:
        points = np.concatenate([r["points"] for r in extras_log])  # (T, B, S, 3)
        w_pred = np.concatenate([r["w_pred"] for r in extras_log])  # (T, B, S)
        w_gt = np.concatenate([r["w_gt"] for r in extras_log])
        samples_dir = os.path.join(log_directory, "samples")
        os.makedirs(samples_dir, exist_ok=True)
        for i in range(t):
            pts_w = points[i].reshape(-1, 3) * world_scale - world_shift
            for suffix, w in (("", w_pred[i].reshape(-1)), ("_gt", w_gt[i].reshape(-1))):
                keep = w > 1e-5
                write_pcd_xyz_intensity(
                    pts_w[keep], w[keep],
                    os.path.join(
                        samples_dir,
                        f"samples_kf{keyframe_count}_it{i}{suffix}.pcd",
                    ),
                )

    if draw_rays_eps and "per_ray_eps" in extras_log[0]:
        eps = np.concatenate([r["per_ray_eps"] for r in extras_log])  # (T, B)
        eps_max = eps_min * (1.0 + js_alpha * max_js_score) + 1e-5
        rays_eps_dir = os.path.join(log_directory, "rays_eps")
        os.makedirs(rays_eps_dir, exist_ok=True)
        for i in range(t):
            v = valid[i]
            pts = rays[i, v, :3] + rays[i, v, 3:6] * depths[i, v, None]
            pts = pts * world_scale - world_shift
            write_pcd_xyz_intensity(
                pts, eps[i, v] / eps_max,
                os.path.join(rays_eps_dir, f"rays_kf{keyframe_count}_it{i}.pcd"),
            )
            origins = rays[i, v, :3] * world_scale - world_shift
            write_pcd_xyz(
                origins,
                os.path.join(rays_eps_dir, f"origins_kf{keyframe_count}_it{i}.pcd"),
            )


def write_pcd_xyz_intensity(points: np.ndarray, intensity: np.ndarray, fname: str) -> None:
    """ASCII PCD with an intensity column (reference rays_to_pcd colors,
    ray_utils.py:326-384)."""
    os.makedirs(os.path.dirname(fname), exist_ok=True)
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    inten = np.asarray(intensity, np.float32).reshape(-1, 1)
    data = np.hstack([pts, inten])
    with open(fname, "w") as f:
        f.write("# .PCD v0.7 - Point Cloud Data file format\n")
        f.write("VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n")
        f.write("TYPE F F F F\nCOUNT 1 1 1 1\n")
        f.write(f"WIDTH {data.shape[0]}\nHEIGHT 1\n")
        f.write("VIEWPOINT 0 0 0 1 0 0 0\n")
        f.write(f"POINTS {data.shape[0]}\nDATA ascii\n")
        np.savetxt(f, data, fmt="%.6f")


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
