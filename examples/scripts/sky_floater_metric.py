#!/usr/bin/env python3
"""Quantify above-horizon floaters in an open-sky drive's trained field.

The A/B oracle for the sky-supervision study (reference
tracker.py:257-296 sky-ray extraction, keyframe.py:87-101 sky-ray
training): on a ceiling-less scene, nothing above the walls ever returns
a lidar hit, so WITHOUT sky supervision the field is free to grow
density ("floaters") there; WITH it, the opacity/LOS losses carve that
air. Two measurements per experiment:

1. **floater points** — points of the rendered map cloud
   (lidar_renders/render_full_<voxel>.npy, produced by
   eval_map_quality.py / renderer_lidar.py) above the highest real
   geometry of the GT map (+margin);
2. **mean sky opacity** — rendered opacity along upward rays
   (elevation > 45 deg) cast from keyframe poses, straight from the
   checkpointed field.

Writes <logdir>/metrics/sky_floaters.yaml and prints it.

Usage:
    python examples/scripts/sky_floater_metric.py <logdir> \
        --gt_map outputs/gt_map_600_open_sky.pcd [--voxel_size 0.05]
"""
from __future__ import annotations

import argparse
import os
import sys

_EXAMPLES_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(_EXAMPLES_DIR))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("log_dir")
    p.add_argument("--gt_map", required=True)
    p.add_argument("--voxel_size", type=float, default=0.05)
    p.add_argument("--margin", type=float, default=0.2)
    p.add_argument("--ckpt_id", default="final")
    p.add_argument("--n_probe_rays", type=int, default=1024)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np
    import yaml

    from loner_tpu.analysis.render_utils import (
        kf_pose_matrices,
        load_experiment,
    )
    from loner_tpu.analysis.renderer_lidar import read_pcd
    from loner_tpu.models.rendering import UniformRaySampler, pack_rays, render_rays

    gt = read_pcd(args.gt_map)
    z_top = float(np.max(gt[:, 2])) + args.margin

    render_path = os.path.join(
        args.log_dir, "lidar_renders", f"render_full_{args.voxel_size}.npy"
    )
    rendered = np.load(render_path)
    floaters = rendered[:, 2] > z_top
    n_floaters = int(floaters.sum())

    # Opacity probe: upward hemisphere rays (elev > 45 deg) from every
    # 3rd keyframe pose, rendered through the checkpointed field.
    model = load_experiment(
        args.log_dir,
        args.ckpt_id if args.ckpt_id.endswith(".tar") else f"{args.ckpt_id}.tar",
    )
    mats, _ = kf_pose_matrices(model)
    rng = np.random.default_rng(0)
    per_pose = max(1, args.n_probe_rays // max(1, len(mats[::3])))
    origins, dirs = [], []
    for m in mats[::3]:
        azim = rng.uniform(0, 2 * np.pi, per_pose)
        elev = rng.uniform(np.deg2rad(45), np.deg2rad(85), per_pose)
        d = np.stack(
            [
                np.cos(elev) * np.cos(azim),
                np.cos(elev) * np.sin(azim),
                np.sin(elev),
            ],
            axis=-1,
        )
        dirs.append(d)
        origins.append(np.broadcast_to(m[:3, 3], d.shape))
    o = np.concatenate(origins).astype(np.float32)
    d = np.concatenate(dirs).astype(np.float32)

    cube = model.world_cube
    scale = float(cube.scale_factor)
    ray_range = tuple(
        float(x)
        for x in model.settings.mapper.optimizer.model_config["data"]["ray_range"]
    )
    n = len(o)
    rays = pack_rays(
        cube.to_cube(o).astype(np.float32),
        d,
        np.full((n,), ray_range[0] / scale, np.float32),
        np.full((n,), ray_range[1] / scale, np.float32),
    )
    out = render_rays(
        jax.random.key(0),
        rays,
        model.field_params,
        model.field_cfg,
        UniformRaySampler(),
        n_samples=256,
        perturb=0.0,
        sigma_only=True,
    )
    opacity = np.asarray(out["opacity"])

    result = {
        "z_top": z_top,
        "num_map_points": int(rendered.shape[0]),
        "num_floater_points": n_floaters,
        "floater_fraction": float(n_floaters / max(1, rendered.shape[0])),
        "mean_sky_opacity": float(opacity.mean()),
        "p90_sky_opacity": float(np.percentile(opacity, 90)),
        "num_probe_rays": int(n),
    }
    os.makedirs(os.path.join(args.log_dir, "metrics"), exist_ok=True)
    with open(
        os.path.join(args.log_dir, "metrics", "sky_floaters.yaml"), "w"
    ) as f:
        yaml.safe_dump(result, f)
    print(yaml.safe_dump(result))


if __name__ == "__main__":
    main()
