"""L1 depth metric: render model depth along real scan rays, compare.

TPU-native counterpart of analysis/compute_l1_depth.py (reference
:42-265): picks N random scans from the dataset, renders the model's
expected depth along each scan's true ray directions at the estimated (or
GT) poses, and writes ``metrics/l1.yaml`` with {min, max, mean, rmse}.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import yaml

from loner_tpu.analysis.render_utils import (
    kf_pose_matrices,
    load_experiment,
    render_depth_chunked,
)
from loner_tpu.common.trajectory import TrajectoryInterpolator
from loner_tpu.datasets.scan_stream import ScanStreamReader


def compute_l1_depth(
    log_dir: str,
    dataset_path: Optional[str] = None,
    ckpt_name: str = "final.tar",
    num_frames: int = 25,
    rays_per_frame: int = 2048,
    use_gt_poses: bool = False,
    n_samples: int = 1024,
    seed: int = 0,
    write: bool = True,
) -> dict:
    model = load_experiment(log_dir, ckpt_name)
    dataset_path = dataset_path or model.settings["dataset_path"]
    reader = ScanStreamReader(dataset_path)
    ray_range = tuple(
        float(x)
        for x in model.settings.mapper.optimizer.model_config["data"]["ray_range"]
    )

    # Pose provider: interpolate the estimated keyframe trajectory (or the
    # GT one) at scan timestamps.
    mats, ts = kf_pose_matrices(model, use_gt=use_gt_poses)
    interp = TrajectoryInterpolator(mats, ts)

    rng = np.random.default_rng(seed)
    frame_ids = rng.choice(len(reader), min(num_frames, len(reader)), replace=False)

    # Scans fan out over local devices (reference: one worker process per
    # GPU, compute_l1_depth.py:66-258); sequential on one chip.
    from loner_tpu.parallel.device_pool import map_jobs

    # Per-frame RNG draws are made up-front so the sampled rays do not
    # depend on worker scheduling.
    frame_rngs = [np.random.default_rng(seed + 1000 + int(fid)) for fid in frame_ids]

    def eval_frame(job, _device):
        fid, frng = job
        scan = reader.read_scan(int(fid))
        t = scan.get_start_time()
        if not (interp.t_min <= t <= interp.t_max):
            return None
        pose = interp.at(t).matrix
        idx = frng.choice(len(scan), min(rays_per_frame, len(scan)), replace=False)
        dirs_s = scan.ray_directions[:, idx].T
        gt = scan.distances[idx]
        keep = (gt > ray_range[0]) & (gt < ray_range[1])
        if keep.sum() == 0:
            return None
        dirs_w = dirs_s[keep] @ pose[:3, :3].T
        origins = np.broadcast_to(pose[:3, 3], dirs_w.shape)
        out = render_depth_chunked(
            model, origins, dirs_w, ray_range, n_samples=n_samples, ret_var=False
        )
        return np.abs(out["depth"] - gt[keep])

    errors = [
        e for e in map_jobs(eval_frame, list(zip(frame_ids, frame_rngs)))
        if e is not None
    ]

    all_err = np.concatenate(errors)
    result = {
        "min": float(all_err.min()),
        "max": float(all_err.max()),
        "mean": float(all_err.mean()),
        "rmse": float(np.sqrt((all_err ** 2).mean())),
        "num_rays": int(all_err.shape[0]),
    }
    if write:
        os.makedirs(os.path.join(log_dir, "metrics"), exist_ok=True)
        with open(os.path.join(log_dir, "metrics", "l1.yaml"), "w") as f:
            yaml.safe_dump(result, f)
    return result


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="L1 depth metric")
    p.add_argument("experiment_directory")
    p.add_argument("--dataset_path", default=None)
    p.add_argument("--ckpt_id", default="final")
    p.add_argument("--num_frames", type=int, default=25)
    p.add_argument("--use_gt_poses", action="store_true")
    args = p.parse_args()
    ckpt = args.ckpt_id if args.ckpt_id.endswith(".tar") else f"{args.ckpt_id}.tar"
    res = compute_l1_depth(
        args.experiment_directory,
        args.dataset_path,
        ckpt,
        num_frames=args.num_frames,
        use_gt_poses=args.use_gt_poses,
    )
    print(yaml.safe_dump(res))
