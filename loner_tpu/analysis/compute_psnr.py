"""Intensity-render PSNR metric: render the trained intensity head at
camera poses, compare to the dataset's camera images.

The reference ships ``img_to_mse``/``mse_to_psnr``
(src/models/losses.py:17-22) but never reports a PSNR (its intensity
head is hardwired frozen — optimizer.py:234,433); here the head trains
(mapping/loss.py camera term), so the render quality is measurable.
Mirrors compute_l1_depth's structure: N images sampled from the dataset,
camera pose = trajectory(t) * lidar_to_camera, full-frame intensity
render, ``metrics/psnr.yaml`` with {min, max, mean} dB plus per-image
rows.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import yaml

from loner_tpu.analysis.render_utils import load_experiment, kf_pose_matrices
from loner_tpu.analysis.renderer import camera_ray_directions, render_dataset_frame
from loner_tpu.common.pose import Pose
from loner_tpu.common.trajectory import TrajectoryInterpolator
from loner_tpu.datasets.scan_stream import ScanStreamReader
from loner_tpu.models.losses import img_to_mse, mse_to_psnr


def compute_psnr(
    log_dir: str,
    dataset_path: Optional[str] = None,
    ckpt_name: str = "final.tar",
    num_images: int = 25,
    n_samples: int = 1024,
    use_gt_poses: bool = False,
    seed: int = 0,
    write: bool = True,
    save_renders: bool = False,
) -> dict:
    model = load_experiment(log_dir, ckpt_name)
    dataset_path = dataset_path or model.settings["dataset_path"]
    reader = ScanStreamReader(dataset_path)
    if not reader.image_files():
        raise SystemExit(f"{dataset_path} has no camera images")

    calib = model.settings["calibration"]
    intr = calib["camera_intrinsic"]
    k = np.asarray(intr["k"], np.float64)
    width, height = int(intr["width"]), int(intr["height"])
    dirs_cam = camera_ray_directions(k, width, height)
    t_lidar_to_camera = Pose.from_settings(calib["lidar_to_camera"]).matrix

    mats, ts = kf_pose_matrices(model, use_gt=use_gt_poses)
    interp = TrajectoryInterpolator(mats, ts)

    rng = np.random.default_rng(seed)
    n_total = len(reader.image_files())
    ids = np.sort(rng.choice(n_total, min(num_images, n_total), replace=False))

    render_dir = os.path.join(log_dir, "intensity_renders")
    if save_renders:
        os.makedirs(render_dir, exist_ok=True)

    rows = []
    for img_idx in ids:
        gt_img, t = reader.read_image(int(img_idx))
        if not (interp.t_min <= t <= interp.t_max):
            continue
        cam_pose = interp.at(t).matrix @ t_lidar_to_camera
        frame = render_dataset_frame(
            model, cam_pose, dirs_cam, (height, width),
            n_samples=n_samples, with_intensity=True,
        )
        pred = np.asarray(frame["intensity"], np.float32)
        gt = np.asarray(gt_img, np.float32)
        if gt.ndim == 2:
            gt = gt[..., None]
        if pred.shape[-1] != gt.shape[-1]:
            # Gray-vs-color mismatch: compare luminance.
            pred, gt = pred.mean(-1, keepdims=True), gt.mean(-1, keepdims=True)
        mse = float(img_to_mse(pred, gt))
        rows.append({
            "image": int(img_idx),
            "timestamp": float(t),
            "mse": mse,
            "psnr": float(mse_to_psnr(mse)),
        })
        if save_renders:
            np.save(os.path.join(render_dir, f"pred_{img_idx:04d}.npy"), pred)
            np.save(os.path.join(render_dir, f"gt_{img_idx:04d}.npy"), gt)

    if not rows:
        raise SystemExit("no images fell inside the trajectory's time span")
    psnrs = np.array([r["psnr"] for r in rows])
    result = {
        "num_images": len(rows),
        "mean": float(psnrs.mean()),
        "min": float(psnrs.min()),
        "max": float(psnrs.max()),
        "images": rows,
    }
    if write:
        metrics_dir = os.path.join(log_dir, "metrics")
        os.makedirs(metrics_dir, exist_ok=True)
        with open(os.path.join(metrics_dir, "psnr.yaml"), "w") as f:
            yaml.safe_dump(result, f)
    return result


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_dir")
    p.add_argument("--dataset", default=None)
    p.add_argument("--ckpt_id", default="final")
    p.add_argument("--num_images", type=int, default=25)
    p.add_argument("--n_samples", type=int, default=1024)
    p.add_argument("--use_gt_poses", action="store_true")
    p.add_argument("--save_renders", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    ckpt = args.ckpt_id if args.ckpt_id.endswith(".tar") else f"{args.ckpt_id}.tar"
    result = compute_psnr(
        args.log_dir, args.dataset, ckpt, num_images=args.num_images,
        n_samples=args.n_samples, use_gt_poses=args.use_gt_poses,
        save_renders=args.save_renders,
    )
    print(yaml.safe_dump({k: v for k, v in result.items() if k != "images"}))


if __name__ == "__main__":
    main()
