"""Batch metric pipelines over experiment output trees.

TPU-native counterpart of analysis/compute_metrics/{traj,maps}
(reference prepare_results.py + analyze.sh + summarize_results.py and
maps/*): walks ``outputs/<experiment>/[config_<i>/][trial_<j>/]`` layouts,
computes trajectory ATE/RPE (native implementation; files remain
evo-compatible) and collects map statistics/l1 yamls, then writes
mean/median/min summary CSV and a LaTeX table.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional

import numpy as np
import yaml

from loner_tpu.analysis.traj_metrics import evaluate_trajectory_files


def find_trial_dirs(experiment_dir: str) -> List[str]:
    """All trial leaf dirs under an experiment (handles config_i/trial_j)."""
    out = []
    for root, dirs, files in os.walk(experiment_dir):
        if os.path.isdir(os.path.join(root, "trajectory")):
            out.append(root)
    return sorted(out)


def analyze_trajectories(
    experiment_dir: str,
    gt_file: Optional[str] = None,
    est_name: str = "estimated_trajectory.txt",
    delta_m: float = 3.0,
) -> Dict[str, dict]:
    """Per-trial ATE/RPE; GT defaults to each trial's logged groundtruth."""
    results = {}
    for trial in find_trial_dirs(experiment_dir):
        est = os.path.join(trial, "trajectory", est_name)
        gt = gt_file or os.path.join(trial, "trajectory", "groundtruth.txt")
        if not (os.path.exists(est) and os.path.exists(gt)):
            continue
        try:
            results[os.path.relpath(trial, experiment_dir)] = evaluate_trajectory_files(
                est, gt, delta_m
            )
        except Exception as e:  # noqa: BLE001 — keep batch robust per-trial
            results[os.path.relpath(trial, experiment_dir)] = {"error": str(e)}
    return results


def summarize_results(
    results: Dict[str, dict],
    out_csv: Optional[str] = None,
    out_tex: Optional[str] = None,
) -> str:
    """mean/median/min ATE RMSE per config across trials
    (reference summarize_results.py semantics)."""
    by_config: Dict[str, List[float]] = {}
    for trial, res in results.items():
        if "error" in res:
            continue
        # config_i/trial_j layouts group by config_i; flat layouts (no
        # trial level) group by the leaf itself.
        config = os.path.dirname(trial) or trial
        by_config.setdefault(config, []).append(res["ate"]["rmse"])

    lines = ["config,num_trials,ate_rmse_mean,ate_rmse_median,ate_rmse_min"]
    tex = ["\\begin{tabular}{lcccc}", "config & N & mean & median & min \\\\"]
    for config, rmses in sorted(by_config.items()):
        arr = np.asarray(rmses)
        lines.append(
            f"{config},{len(arr)},{arr.mean():.4f},{np.median(arr):.4f},{arr.min():.4f}"
        )
        tex.append(
            f"{config} & {len(arr)} & {arr.mean():.4f} & {np.median(arr):.4f} & {arr.min():.4f} \\\\"
        )
    tex.append("\\end{tabular}")

    csv = "\n".join(lines)
    if out_csv:
        with open(out_csv, "w") as f:
            f.write(csv + "\n")
    if out_tex:
        with open(out_tex, "w") as f:
            f.write("\n".join(tex) + "\n")
    return csv


def collect_map_metrics(experiment_dir: str) -> Dict[str, dict]:
    """Collect metrics/statistics*.yaml + metrics/l1*.yaml per trial
    (reference compute_metrics/maps collection step)."""
    results = {}
    for trial in find_trial_dirs(experiment_dir):
        entry = {}
        for f in glob.glob(os.path.join(trial, "metrics", "*.yaml")):
            with open(f) as fh:
                entry[os.path.splitext(os.path.basename(f))[0]] = yaml.safe_load(fh)
        if entry:
            results[os.path.relpath(trial, experiment_dir)] = entry
    return results


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description="Trajectory + map metrics over an experiment tree")
    p.add_argument("experiment_dir")
    p.add_argument("--gt_file", default=None)
    p.add_argument("--delta_m", type=float, default=3.0)
    args = p.parse_args()

    results = analyze_trajectories(args.experiment_dir, args.gt_file, delta_m=args.delta_m)
    with open(os.path.join(args.experiment_dir, "traj_metrics.yaml"), "w") as f:
        yaml.safe_dump(results, f)
    csv = summarize_results(
        results,
        out_csv=os.path.join(args.experiment_dir, "summary.csv"),
        out_tex=os.path.join(args.experiment_dir, "summary.tex"),
    )
    print(csv)
    maps = collect_map_metrics(args.experiment_dir)
    if maps:
        with open(os.path.join(args.experiment_dir, "map_metrics.yaml"), "w") as f:
            yaml.safe_dump(maps, f)
        print(f"map metrics for {len(maps)} trials collected")
