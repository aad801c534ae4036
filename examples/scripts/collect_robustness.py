#!/usr/bin/env python3
"""Collect the robustness-drill table (VERDICT r4 item 6).

For each finished courtyard drive (static flagship + the degraded
variants from robustness_drill.sh): trajectory ATE/RPE vs the run's own
ground truth, map accuracy/completion/chamfer/F@0.1m vs the STATIC
courtyard GT map (the static geometry is the reconstruction target even
when the inputs contained transients/noise/dropout), and the wall-clock
RTF. Writes artifacts/scale_drive_r5/robustness.yaml.

Renders attach to the TPU — serialize with any running drive.

Usage:
    python examples/scripts/collect_robustness.py [--runs name1 name2 ...]
"""
from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "examples"))

DEFAULT_RUNS = [
    ("static", "courtyard_tpu_r5f"),
    ("actors", "courtyard_actors_r5"),
    ("noise_0.05m", "courtyard_n0.05_r5"),
    ("noise_0.15m", "courtyard_n0.15_r5"),
    ("dropout_30pct", "courtyard_d0.3_r5"),
    ("dropout_60pct", "courtyard_d0.6_r5"),
]
SEQ_SECONDS = 151.2  # courtyard waypoint loop duration (meta trajectory)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs", nargs="*", default=None,
                   help="override run names (label=dirname pairs)")
    p.add_argument("--gt_map", default="outputs/gt_map_courtyard.pcd")
    p.add_argument("--skip_map", action="store_true",
                   help="trajectory + RTF only (no TPU renders)")
    p.add_argument("--out", default="artifacts/scale_drive_r5/robustness.yaml")
    args = p.parse_args()

    runs = DEFAULT_RUNS
    if args.runs:
        runs = [tuple(r.split("=", 1)) for r in args.runs]

    import yaml

    from loner_tpu.analysis.traj_metrics import evaluate_trajectory_files

    table = {}
    for label, name in runs:
        log_dir = os.path.join("outputs", name)
        if not os.path.isfile(os.path.join(log_dir, "runtime.txt")):
            print(f"-- {label}: {log_dir} not finished, skipping", flush=True)
            continue
        row = {}
        traj = evaluate_trajectory_files(
            os.path.join(log_dir, "trajectory", "estimated_trajectory.txt"),
            os.path.join(log_dir, "trajectory", "groundtruth.txt"),
            delta_m=1.0,
        )
        row["ate_rmse_m"] = round(float(traj["ate"]["rmse"]), 4)
        row["ate_max_m"] = round(float(traj["ate"]["max"]), 4)
        row["rpe_trans_rmse_m"] = round(float(traj["rpe_trans"]["rmse"]), 4)
        with open(os.path.join(log_dir, "runtime.txt")) as f:
            runtime = float(f.readline().split(":")[1])
        row["runtime_s"] = round(runtime, 1)
        row["rtf"] = round(SEQ_SECONDS / runtime, 3)

        if not args.skip_map:
            from mask_gt_with_trajectory import mask_gt_map
            from loner_tpu.analysis.evaluate_lidar_map import evaluate_lidar_map
            from loner_tpu.analysis.renderer_lidar import read_pcd, render_full_map

            rendered = render_full_map(
                log_dir, "final.tar", voxel_size=0.05, skip_step=3,
                var_threshold=0.25,
            )
            gt = read_pcd(args.gt_map)
            gt_masked = mask_gt_map(gt, rendered, dist_threshold=0.1)
            stats = evaluate_lidar_map(
                rendered, gt_masked, voxel_size=0.05,
                f_score_threshold=0.1, log_dir=log_dir,
            )
            row["map_f_at_0.1m"] = round(float(stats["f_score"]), 4)
            row["map_accuracy_m"] = round(float(stats["accuracy"]), 4)
            row["map_completion_m"] = round(float(stats["completion"]), 4)
        table[label] = row
        print(f"-- {label}: {row}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        yaml.safe_dump(table, f, sort_keys=False)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
