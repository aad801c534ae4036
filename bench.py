#!/usr/bin/env python3
"""Benchmark: mapping-loop throughput on one TPU chip at reference scale.

Measures the hot path of LONER's mapping thread at the reference's exact
workload (BASELINE.md): window of 8 keyframes x 512 rays x 512
samples/ray, 16-level 2^18 hash grid + 64-wide MLP, OGM importance
sampling, JS dynamic-margin loss, joint pose+map Adam — i.e. one full
optimization iteration including backward and the periodic occupancy
update, exactly what must sustain >= 16.7 it/s for real-time operation.

Baseline bar (derived in BASELINE.md): 16.7 iters/s == ~68k mapped rays/s
== ~35-40M point-evals/s on the reference's CUDA GPU.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from loner_tpu.common.jax_setup import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp
import numpy as np

BASELINE_RAYS_PER_SEC = 68_000.0  # 16.7 it/s * 8 KFs * 512 rays


def main() -> None:
    from loner_tpu.mapping.optimizer import (
        OptimizerConfig,
        PhaseSettings,
        make_phase_runner,
    )
    from loner_tpu.mapping.rays import build_window_buffers
    from loner_tpu.models.field import FieldConfig, init_field_params
    from loner_tpu.models.occupancy_grid import init_occ_grid

    w, n_rays, n_samples = 8, 512, 512
    cfg = OptimizerConfig(
        n_lidar_samples=n_rays,
        n_sky_samples=0,
        n_samples_per_ray=n_samples,
        window_size=w,
        ray_range=(1.0, 10.0),
    )
    field_cfg = FieldConfig()  # reference scale: 16 levels @ 2^18, 64-wide MLP

    rng = np.random.default_rng(0)
    dirs, depths = [], []
    points_per_scan = 65_536
    for _ in range(w):
        d = rng.normal(size=(3, points_per_scan))
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        dirs.append(d.astype(np.float32))
        depths.append(rng.uniform(1.5, 9.5, points_per_scan).astype(np.float32))
    buffers = build_window_buffers(dirs, depths, [None] * w, w)

    params = init_field_params(jax.random.key(0), field_cfg)
    occ = init_occ_grid(cfg.occ_voxel_size)
    twists = jnp.asarray(rng.normal(0, 0.02, (w, 6)).astype(np.float32))
    pose_mask = jnp.ones((w,), jnp.float32)
    world_scale = jnp.asarray(12.0, jnp.float32)
    world_shift = jnp.zeros(3, jnp.float32)

    phase = PhaseSettings(num_iterations=50, freeze_poses=False, freeze_sigma_mlp=False)
    runner = make_phase_runner(
        cfg, field_cfg, phase, w, buffers.dirs.shape[1], buffers.sky_dirs.shape[1]
    )

    state = (params, occ, twists)

    def run(state, step0, seed, n_iters):
        p, o, t = state
        out = runner(
            p, o, t, buffers, pose_mask, world_scale, world_shift,
            step0, jax.random.key(seed), num_iterations=n_iters,
        )
        # Force completion via host transfer (block_until_ready has proven
        # unreliable on the experimental axon platform). Params are donated
        # inside the step, so thread the returned state forward.
        np.asarray(out[3])
        return (out[0], out[1], out[2])

    import sys

    print("bench: compiling + warmup...", file=sys.stderr, flush=True)
    state = run(state, 0, 1, 5)  # warmup + compile
    print("bench: timing...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    n_phases, iters_per_phase = 3, 50
    for i in range(n_phases):
        state = run(state, 5 + iters_per_phase * i, 2 + i, iters_per_phase)
    elapsed = time.perf_counter() - t0

    iters = iters_per_phase * n_phases
    iters_per_sec = iters / elapsed
    rays_per_sec = iters_per_sec * w * n_rays
    point_evals_per_sec = rays_per_sec * n_samples

    result = {
        "metric": "mapped rays/sec/chip (8KF x 512 rays x 512 samples, joint pose+map iter incl. backward)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "iters_per_sec": round(iters_per_sec, 2),
        "point_evals_per_sec": round(point_evals_per_sec, 0),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
