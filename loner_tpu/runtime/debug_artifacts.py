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


class IterationRayRecordDumper:
    """Streaming per-iteration ray/sample debug dumps for one keyframe
    optimization. Reproduces the reference's three debug products:

    * ``store_ray`` (optimizer.py:393-410): accumulated sampled rays over
      ALL iterations -> rays/lidar/kf_N.pcd, plus per-ray sky/current-kf
      masks and the per-iteration std / JS records as .npy (the reference
      saves torch .pt tensors; same content).
    * ``draw_samples`` (optimizer.py:540-557): per-iteration sample points
      with predicted/target weights > 1e-5 -> samples/samples_kfK_itI.pcd.
    * ``draw_rays_eps`` (optimizer.py:559-566): per-iteration rays colored
      by normalized dynamic margin -> rays_eps/rays_kfK_itI.pcd.

    Records stream through ``append`` (one per dispatch, leading
    iteration axis) and the heavy per-iteration tensors (draw_samples'
    full sample clouds are ~50 MB/iteration at reference scale) are
    written and DISCARDED immediately — accumulating them for a
    1000-iteration bootstrap keyframe would hold tens of GB in host RAM.
    Only the small store_ray fields accumulate until ``finish``.
    Iteration indices run sequentially across the keyframe's phases.
    """

    def __init__(
        self,
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
        self._dir = log_directory
        self._kf = keyframe_count
        self._n_lidar = n_lidar
        self._n_sky = n_sky
        self._num_kfs = num_kfs
        self._scale = world_scale
        self._shift = world_shift
        self._eps_max = eps_min * (1.0 + js_alpha * max_js_score) + 1e-5
        self._store_ray = store_ray
        self._draw_samples = draw_samples
        self._draw_rays_eps = draw_rays_eps
        self._it = 0
        self._ray_acc: list = []  # small (rays, depths, std, js, valid) rows

    def __bool__(self) -> bool:  # mirrors `if extras_log` truthiness checks
        return True

    def append(self, rec: dict) -> None:
        rays = np.asarray(rec["rays"])  # (T, B, 11)
        depths = np.asarray(rec["depths_cube"])
        valid = np.asarray(rec["valid"]).astype(bool)
        t, b = depths.shape

        if self._store_ray:
            self._ray_acc.append(
                (rays, depths, np.asarray(rec["std"]), np.asarray(rec["js"]), valid)
            )

        if self._draw_samples and "points" in rec:
            points = np.asarray(rec["points"])  # (T, B, S, 3)
            w_pred = np.asarray(rec["w_pred"])  # (T, B, S)
            w_gt = np.asarray(rec["w_gt"])
            samples_dir = os.path.join(self._dir, "samples")
            os.makedirs(samples_dir, exist_ok=True)
            for i in range(t):
                pts_w = points[i].reshape(-1, 3) * self._scale - self._shift
                for suffix, w in (
                    ("", w_pred[i].reshape(-1)), ("_gt", w_gt[i].reshape(-1))
                ):
                    keep = w > 1e-5
                    write_pcd_xyz_intensity(
                        pts_w[keep], w[keep],
                        os.path.join(
                            samples_dir,
                            f"samples_kf{self._kf}_it{self._it + i}{suffix}.pcd",
                        ),
                    )

        if self._draw_rays_eps and "per_ray_eps" in rec:
            eps = np.asarray(rec["per_ray_eps"])  # (T, B)
            rays_eps_dir = os.path.join(self._dir, "rays_eps")
            os.makedirs(rays_eps_dir, exist_ok=True)
            for i in range(t):
                v = valid[i]
                pts = rays_to_points(rays[i, v], depths[i, v])
                pts = pts * self._scale - self._shift
                write_pcd_xyz_intensity(
                    pts, eps[i, v] / self._eps_max,
                    os.path.join(
                        rays_eps_dir, f"rays_kf{self._kf}_it{self._it + i}.pcd"
                    ),
                )
                origins = rays[i, v, :3] * self._scale - self._shift
                write_pcd_xyz(
                    origins,
                    os.path.join(
                        rays_eps_dir, f"origins_kf{self._kf}_it{self._it + i}.pcd"
                    ),
                )

        self._it += t

    def finish(self) -> None:
        if not self._store_ray or not self._ray_acc:
            return
        rays = np.concatenate([r[0] for r in self._ray_acc])  # (T, B, 11)
        depths = np.concatenate([r[1] for r in self._ray_acc])
        std = np.concatenate([r[2] for r in self._ray_acc])
        js = np.concatenate([r[3] for r in self._ray_acc])
        valid = np.concatenate([r[4] for r in self._ray_acc])
        t, b = depths.shape

        # Batch layout: window_slots chunks of (n_lidar + n_sky) rays.
        per_slot = self._n_lidar + self._n_sky
        slot = np.arange(b) // per_slot
        in_slot = np.arange(b) % per_slot
        sky_mask = np.broadcast_to(in_slot >= self._n_lidar, (t, b))
        curr_mask = np.broadcast_to(slot == self._num_kfs - 1, (t, b))

        v = valid.reshape(-1)
        flat_rays = rays.reshape(-1, 11)[v]
        flat_depths = depths.reshape(-1)[v]
        pts = rays_to_points(flat_rays, flat_depths) * self._scale - self._shift
        write_pcd_xyz(
            pts, os.path.join(self._dir, "rays", "lidar", f"kf_{self._kf}.pcd")
        )
        for name, arr in (
            ("sky_mask", sky_mask.reshape(-1)[v]),
            ("curr_mask", curr_mask.reshape(-1)[v]),
            ("std", std.reshape(-1)[v]),
            ("js", js.reshape(-1)[v]),
        ):
            d = os.path.join(self._dir, "rays", name)
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, f"kf_{self._kf}.npy"), arr)


def dump_iteration_ray_record(extras_log: list, *args, **kwargs) -> None:
    """Batch wrapper over IterationRayRecordDumper (kept for callers that
    already hold the full record list)."""
    dumper = IterationRayRecordDumper(*args, **kwargs)
    for rec in extras_log:
        dumper.append(rec)
    dumper.finish()


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
