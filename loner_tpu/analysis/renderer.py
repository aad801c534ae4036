"""Depth/intensity image renderer from a trained checkpoint.

TPU-native counterpart of analysis/renderer.py (reference :172-480):
renders depth (and, when the intensity head was trained, color) images at
given camera or lidar poses in ray chunks, plus a video-flythrough pose
generator (interpolated trajectory with periodic 360-degree spins). The
reference's multi-GPU worker pool becomes simple chunked device batches —
one chip renders a 512x512 depth image in a single dispatch.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
from scipy.spatial.transform import Rotation as _R

from loner_tpu.analysis.render_utils import (
    LoadedModel,
    kf_pose_matrices,
    load_experiment,
    render_depth_chunked,
)


def camera_ray_directions(
    k: np.ndarray, width: int, height: int
) -> np.ndarray:
    """(H*W, 3) pinhole ray directions in camera frame (z forward)."""
    xs, ys = np.meshgrid(np.arange(width), np.arange(height))
    dirs = np.stack(
        [
            (xs - k[0, 2]) / k[0, 0],
            (ys - k[1, 2]) / k[1, 1],
            np.ones_like(xs, dtype=np.float64),
        ],
        axis=-1,
    ).reshape(-1, 3)
    return (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)).astype(np.float32)


def spherical_ray_directions(
    width: int = 512, height: int = 256, v_fov_deg: Tuple[float, float] = (-45, 45)
) -> np.ndarray:
    """Panoramic (equirectangular) directions — the natural 'image' for a
    lidar-only map."""
    azim = np.linspace(0, 2 * np.pi, width, endpoint=False)
    elev = np.deg2rad(np.linspace(v_fov_deg[1], v_fov_deg[0], height))
    az, el = np.meshgrid(azim, elev)
    return np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=-1
    ).reshape(-1, 3).astype(np.float32)


def render_dataset_frame(
    model: LoadedModel,
    pose_mat: np.ndarray,
    dirs_sensor: np.ndarray,
    image_shape: Tuple[int, int],
    ray_range: Optional[Tuple[float, float]] = None,
    n_samples: int = 2048,
    chunk: int = 2048,
    with_intensity: bool = False,
    with_peak: bool = False,
) -> dict:
    """Render one frame; returns {'depth': (H, W), 'variance': (H, W)}
    plus 'intensity' (H, W, C) when requested (reference renderer.py's
    color renders; needs a head trained via freeze_rgb_mlp: False) and
    'peak_depth_consistency' (H, W) meters when ``with_peak`` (reference
    renderer.py:197-203: |z at the weight peak - expected depth|, a
    per-pixel multimodality/confidence map)."""
    if ray_range is None:
        ray_range = tuple(
            float(x)
            for x in model.settings.mapper.optimizer.model_config["data"]["ray_range"]
        )
    dirs_world = dirs_sensor @ pose_mat[:3, :3].T
    origins = np.broadcast_to(pose_mat[:3, 3], dirs_world.shape)
    out = render_depth_chunked(
        model, origins, dirs_world, ray_range, n_samples=n_samples, chunk=chunk,
        with_intensity=with_intensity, with_peak=with_peak,
    )
    h, w = image_shape
    result = {
        "depth": out["depth"].reshape(h, w),
        "variance": out["variance"].reshape(h, w),
        "opacity": out["opacity"].reshape(h, w),
    }
    if with_intensity:
        result["intensity"] = out["rgb"].reshape(h, w, -1)
    if with_peak:
        result["peak_depth_consistency"] = out["peak_depth_consistency"].reshape(
            h, w
        )
    return result


def flythrough_poses(
    kf_mats: np.ndarray,
    steps_between: int = 10,
    spin_every: int = 0,
    spin_steps: int = 36,
) -> np.ndarray:
    """Interpolated trajectory with optional 360-degree spins
    (reference renderer.py:322-420)."""
    from loner_tpu.common.se3 import interpolate_transforms
    import jax.numpy as jnp

    out = []
    for i in range(len(kf_mats) - 1):
        alphas = np.linspace(0, 1, steps_between, endpoint=False)
        interp = np.asarray(
            interpolate_transforms(
                jnp.asarray(kf_mats[i], jnp.float32),
                jnp.asarray(kf_mats[i + 1], jnp.float32),
                jnp.asarray(alphas, jnp.float32),
            )
        )
        out.extend(interp)
        if spin_every and (i + 1) % spin_every == 0:
            base = kf_mats[i + 1].copy()
            for ang in np.linspace(0, 2 * np.pi, spin_steps, endpoint=False):
                spin = base.copy()
                spin[:3, :3] = base[:3, :3] @ _R.from_euler("z", [ang]).as_matrix()[0]
                out.append(spin)
    out.append(kf_mats[-1])
    return np.stack(out)


def render_sequence(
    log_dir: str,
    ckpt_name: str = "final.tar",
    width: int = 512,
    height: int = 256,
    skip_step: int = 1,
    use_gt_poses: bool = False,
    n_samples: int = 1024,
    out_dir: Optional[str] = None,
    with_intensity: bool = False,
    with_peak: bool = False,
    start_frame: int = 0,
    only_last_frame: bool = False,
    explicit_pose: Optional[np.ndarray] = None,
    traj_file: Optional[str] = None,
) -> str:
    """Render panoramic depth images at keyframe poses -> renders/*.npy + .png.
    ``with_intensity`` additionally writes intensity_*.png from the
    trained intensity head; ``with_peak`` writes peak_*.npy/.png
    peak-depth-consistency maps (reference renderer.py:197-203).
    ``start_frame``/``only_last_frame`` subset the keyframe poses;
    ``explicit_pose`` (a 4x4 in world meters) renders that single pose
    instead (reference renderer.py:68-75
    --start_frame/--only_last_frame/--render_pose)."""
    model = load_experiment(log_dir, ckpt_name)
    if explicit_pose is not None:
        mats = np.asarray(explicit_pose, np.float64)[None]
    elif traj_file is not None:
        # Render along an arbitrary TUM trajectory instead of the
        # keyframe poses (reference renderer.py:71 --traj).
        from loner_tpu.common.trajectory import load_tum_trajectory

        mats, _ = load_tum_trajectory(traj_file)
        mats = mats[-1:] if only_last_frame else mats[start_frame:]
    else:
        mats, _ = kf_pose_matrices(model, use_gt=use_gt_poses)
        mats = mats[-1:] if only_last_frame else mats[start_frame:]
    dirs = spherical_ray_directions(width, height)
    out_dir = out_dir or os.path.join(log_dir, "renders")
    os.makedirs(out_dir, exist_ok=True)

    for i, pose in enumerate(mats[::skip_step]):
        frame = render_dataset_frame(
            model, pose, dirs, (height, width), n_samples=n_samples,
            with_intensity=with_intensity, with_peak=with_peak,
        )
        np.save(os.path.join(out_dir, f"depth_{i:04d}.npy"), frame["depth"])
        _save_depth_png(frame["depth"], os.path.join(out_dir, f"depth_{i:04d}.png"))
        if with_intensity:
            np.save(
                os.path.join(out_dir, f"intensity_{i:04d}.npy"), frame["intensity"]
            )
            _save_rgb_png(
                frame["intensity"], os.path.join(out_dir, f"intensity_{i:04d}.png")
            )
        if with_peak:
            peak = frame["peak_depth_consistency"]
            np.save(os.path.join(out_dir, f"peak_{i:04d}.npy"), peak)
            _save_depth_png(peak, os.path.join(out_dir, f"peak_{i:04d}.png"))
    return out_dir


def render_flythrough(
    log_dir: str,
    ckpt_name: str = "final.tar",
    width: int = 512,
    height: int = 256,
    steps_between: int = 4,
    spin_every: int = 10,
    spin_steps: int = 36,
    fps: int = 10,
    n_samples: int = 512,
    use_gt_poses: bool = False,
    out_dir: Optional[str] = None,
) -> str:
    """Video flythrough (reference renderer.py:322-480): interpolated
    trajectory with periodic 360-degree spins, rendered frame-by-frame.

    The video itself is assembled in-process as MJPEG/AVI
    (``flythrough.avi``, see :mod:`loner_tpu.analysis.video`) — no ffmpeg
    needed; ``make_video.sh`` additionally holds the ffmpeg one-liner for
    an H.264 .mp4 anywhere ffmpeg exists. Frames fan out over local
    devices (the reference uses a per-GPU process pool).
    """
    model = load_experiment(log_dir, ckpt_name)
    mats, _ = kf_pose_matrices(model, use_gt=use_gt_poses)
    poses = flythrough_poses(
        mats, steps_between=steps_between, spin_every=spin_every,
        spin_steps=spin_steps,
    )
    dirs = spherical_ray_directions(width, height)
    out_dir = out_dir or os.path.join(log_dir, "flythrough")
    os.makedirs(out_dir, exist_ok=True)

    from loner_tpu.parallel.device_pool import map_jobs

    def render_one(job, _device):
        i, pose = job
        frame = render_dataset_frame(
            model, pose, dirs, (height, width), n_samples=n_samples
        )
        fname = f"frame_{i:05d}.png"
        _save_depth_png(frame["depth"], os.path.join(out_dir, fname))
        return fname

    frames = map_jobs(render_one, list(enumerate(poses)))
    with open(os.path.join(out_dir, "frames.txt"), "w") as f:
        f.write("\n".join(frames) + "\n")
    cmd = (
        f"ffmpeg -framerate {fps} -i frame_%05d.png "
        f"-c:v libx264 -pix_fmt yuv420p flythrough.mp4"
    )
    with open(os.path.join(out_dir, "make_video.sh"), "w") as f:
        f.write("#!/bin/sh\n# Assemble the flythrough (run where ffmpeg exists)\n")
        f.write(cmd + "\n")
    from loner_tpu.analysis.video import write_mjpeg_avi

    write_mjpeg_avi(
        os.path.join(out_dir, "flythrough.avi"),
        [os.path.join(out_dir, f) for f in frames],
        fps=fps,
    )
    return out_dir


def _save_depth_png(depth: np.ndarray, fname: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(fname, depth, cmap="turbo")


def _save_rgb_png(rgb: np.ndarray, fname: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rgb = np.clip(rgb, 0.0, 1.0)
    if rgb.shape[-1] == 1:
        plt.imsave(fname, rgb[..., 0], cmap="gray", vmin=0.0, vmax=1.0)
    else:
        plt.imsave(fname, rgb)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Render depth images from checkpoint")
    p.add_argument("experiment_directory")
    p.add_argument("--ckpt_id", default="final")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--skip_step", type=int, default=1)
    p.add_argument("--use_gt_poses", action="store_true")
    p.add_argument(
        "--render_intensity", action="store_true",
        help="also render intensity images from the trained head",
    )
    p.add_argument(
        "--render_peak", action="store_true",
        help="also render peak-depth-consistency maps "
        "(reference renderer.py:197-203)",
    )
    p.add_argument(
        "--flythrough", action="store_true",
        help="render the spin-flythrough frame sequence instead",
    )
    p.add_argument("--start_frame", type=int, default=0)
    p.add_argument("--only_last_frame", action="store_true")
    p.add_argument(
        "--traj", default=None,
        help="render along this TUM trajectory file instead of the "
        "keyframe poses (reference renderer.py:71)",
    )
    p.add_argument(
        "--render_pose", type=float, nargs=6, default=None,
        metavar=("X", "Y", "Z", "YAW", "PITCH", "ROLL"),
        help="render one explicit pose (meters; ZYX Euler, degrees) "
        "instead of the keyframe trajectory (reference renderer.py:75)",
    )
    args = p.parse_args()
    ckpt = args.ckpt_id if args.ckpt_id.endswith(".tar") else f"{args.ckpt_id}.tar"
    if args.flythrough:
        print(
            render_flythrough(
                args.experiment_directory,
                ckpt,
                width=args.width,
                height=args.height,
                use_gt_poses=args.use_gt_poses,
            )
        )
    else:
        explicit = None
        if args.render_pose is not None:
            from scipy.spatial.transform import Rotation

            x, y, z, yaw, pitch, roll = args.render_pose
            explicit = np.eye(4)
            explicit[:3, :3] = Rotation.from_euler(
                "ZYX", [yaw, pitch, roll], degrees=True
            ).as_matrix()
            explicit[:3, 3] = [x, y, z]
        print(
            render_sequence(
                args.experiment_directory,
                ckpt,
                width=args.width,
                height=args.height,
                skip_step=args.skip_step,
                use_gt_poses=args.use_gt_poses,
                with_intensity=args.render_intensity,
                with_peak=args.render_peak,
                start_frame=args.start_frame,
                only_last_frame=args.only_last_frame,
                explicit_pose=explicit,
                traj_file=args.traj,
            )
        )
