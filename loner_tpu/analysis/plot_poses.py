"""XY plot of GT vs optimized (vs tracked) keyframe translations.

TPU-native counterpart of analysis/plot_poses.py (reference :66-136):
reads the keyframe pose states out of a checkpoint and writes poses.png.
"""
from __future__ import annotations

import os

import numpy as np

from loner_tpu.analysis.render_utils import load_experiment
from loner_tpu.common.pose import Pose


def plot_poses(log_dir: str, ckpt_name: str = "final.tar", out_file: str = None) -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    model = load_experiment(log_dir, ckpt_name)

    def translations(key):
        out = []
        for state in model.poses:
            if state.get(key) is None:
                return None
            out.append(Pose.from_twist(state[key]).get_translation())
        return np.stack(out) if out else None

    est = translations("lidar_pose")
    gt = translations("gt_lidar_pose")
    tracked = translations("tracked_pose")

    plt.figure(figsize=(8, 8))
    if gt is not None:
        plt.plot(gt[:, 0], gt[:, 1], "g.-", label="ground truth")
    if tracked is not None:
        plt.plot(tracked[:, 0], tracked[:, 1], "b.--", label="tracked", alpha=0.6)
    if est is not None:
        plt.plot(est[:, 0], est[:, 1], "r.-", label="optimized")
    plt.axis("equal")
    plt.xlabel("x (m)")
    plt.ylabel("y (m)")
    plt.legend()
    plt.title("Keyframe poses")
    out_file = out_file or os.path.join(log_dir, "poses.png")
    plt.savefig(out_file, dpi=120, bbox_inches="tight")
    plt.close()
    return out_file


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("experiment_directory")
    p.add_argument("--ckpt_id", default="final")
    args = p.parse_args()
    ckpt = args.ckpt_id if args.ckpt_id.endswith(".tar") else f"{args.ckpt_id}.tar"
    print(plot_poses(args.experiment_directory, ckpt))
