#!/usr/bin/env python3
"""Full map-quality evaluation for a finished SLAM drive, one command.

Chains the individual offline tools exactly the way the round-3/4
quality records were produced (reference counterparts:
analysis/renderer_lidar.py, examples/fusion_portable/
mask_gt_with_trajectory.py:69-121, analysis/evaluate_lidar_map.py:59-81,
analysis/compute_l1_depth.py:260-265):

1. render the trained field into a virtual-scan map cloud
   (voxel 0.05, variance <= 0.25, every 3rd keyframe scan pose);
2. mask the ground-truth map to the lidar-visible region (within
   0.1 m of the reconstruction);
3. accuracy / completion / chamfer / precision / recall / F@0.1 m
   -> <logdir>/metrics/statistics.yaml;
4. L1 depth over 25 random scans -> <logdir>/metrics/l1.yaml.

Runs in ONE process: the renders attach to the TPU (or whatever
platform jax resolves); the metric steps are host-side scipy/numpy.
Serialize with any running drive — one axon process at a time.

Usage:
    python examples/scripts/eval_map_quality.py <logdir> \
        --gt_map outputs/gt_map_600.pcd \
        [--dataset outputs/synthetic_dataset_600] [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys

_EXAMPLES_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(_EXAMPLES_DIR))
sys.path.insert(0, _EXAMPLES_DIR)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_dir")
    p.add_argument("--gt_map", required=True, help=".pcd from create_lidar_map.py")
    p.add_argument("--dataset", default=None, help="dataset dir for the L1 metric")
    p.add_argument("--ckpt_id", default="final")
    p.add_argument("--voxel_size", type=float, default=0.05)
    p.add_argument("--var_threshold", type=float, default=0.25)
    p.add_argument("--skip_step", type=int, default=3)
    p.add_argument("--threshold", type=float, default=0.1)
    p.add_argument("--skip_l1", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import yaml

    from mask_gt_with_trajectory import mask_gt_map
    from loner_tpu.analysis.compute_l1_depth import compute_l1_depth
    from loner_tpu.analysis.evaluate_lidar_map import evaluate_lidar_map
    from loner_tpu.analysis.renderer_lidar import read_pcd, render_full_map, write_pcd

    ckpt = args.ckpt_id if args.ckpt_id.endswith(".tar") else f"{args.ckpt_id}.tar"

    rendered = render_full_map(
        args.log_dir,
        ckpt,
        voxel_size=args.voxel_size,
        skip_step=args.skip_step,
        var_threshold=args.var_threshold,
    )
    print(f"rendered map cloud: {rendered.shape[0]} points", flush=True)

    gt = read_pcd(args.gt_map)
    gt_masked = mask_gt_map(gt, rendered, dist_threshold=args.threshold)
    masked_path = os.path.join(
        args.log_dir, "lidar_renders", "gt_map_masked.pcd"
    )
    write_pcd(gt_masked, masked_path)
    print(
        f"masked GT map: {gt.shape[0]} -> {gt_masked.shape[0]} points", flush=True
    )

    stats = evaluate_lidar_map(
        rendered,
        gt_masked,
        voxel_size=args.voxel_size,
        f_score_threshold=args.threshold,
        log_dir=args.log_dir,
    )
    print(yaml.safe_dump(stats), flush=True)

    if not args.skip_l1:
        l1 = compute_l1_depth(args.log_dir, args.dataset, ckpt)
        print(yaml.safe_dump(l1), flush=True)


if __name__ == "__main__":
    main()
