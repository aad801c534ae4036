#!/usr/bin/env python3
"""Benchmark: mapping-loop throughput on one TPU chip at reference scale.

Measures the hot path of LONER's mapping thread at the reference's exact
workload (BASELINE.md): window of 8 keyframes x 512 rays x 512
samples/ray, 16-level 2^18 hash grid + 64-wide MLP, OGM importance
sampling, JS dynamic-margin loss, joint pose+map Adam — one full
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

from loner_tpu.mapping.optimizer import OptimizerConfig, PhaseSettings, make_phase_runner
from loner_tpu.mapping.rays import build_window_buffers
from loner_tpu.models.field import FieldConfig, init_field_params
from loner_tpu.models.occupancy_grid import init_occ_grid

BASELINE_RAYS_PER_SEC = 68_000.0  # 16.7 it/s * 8 KFs * 512 rays


def main() -> None:
    w, n_rays, n_samples = 8, 512, 512
    cfg = OptimizerConfig(
        n_lidar_samples=n_rays, n_sky_samples=0, n_samples_per_ray=n_samples,
        window_size=w, ray_range=(1.0, 10.0), samples_strategy="OGM",
    )
    field_cfg = FieldConfig()  # reference scale: 16 levels @ 2^18, 64-wide MLP
    rng = np.random.default_rng(0)
    dirs, depths = [], []
    for _ in range(w):
        d = rng.normal(size=(3, 65536))
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        dirs.append(d.astype(np.float32))
        depths.append(rng.uniform(1.5, 9.5, 65536).astype(np.float32))
    buffers = build_window_buffers(dirs, depths, [None] * w, w)
    params = init_field_params(jax.random.key(0), field_cfg)
    occ = init_occ_grid(cfg.occ_voxel_size)
    twists = jnp.asarray(rng.normal(0, 0.02, (w, 6)).astype(np.float32))
    phase = PhaseSettings(num_iterations=1, freeze_poses=False, freeze_sigma_mlp=False)
    runner = make_phase_runner(
        cfg, field_cfg, phase, w, buffers.dirs.shape[1], buffers.sky_dirs.shape[1]
    )

    print("bench: compiling + warmup...", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    out = runner(
        params, occ, twists, buffers, jnp.ones((w,), jnp.float32),
        jnp.asarray(12.0, jnp.float32), jnp.zeros(3, jnp.float32),
        0, jax.random.key(1), num_iterations=1,
    )
    np.asarray(out[3])
    print(f"bench: compiled in {time.perf_counter() - t0:.1f}s; timing...",
          file=sys.stderr, flush=True)

    n_iter = 30
    t0 = time.perf_counter()
    out = runner(
        out[0], out[1], out[2], buffers, jnp.ones((w,), jnp.float32),
        jnp.asarray(12.0, jnp.float32), jnp.zeros(3, jnp.float32),
        1, jax.random.key(2), num_iterations=n_iter,
    )
    np.asarray(out[3])  # force completion (axon block_until_ready unreliable)
    elapsed = time.perf_counter() - t0

    iters_per_sec = n_iter / elapsed
    rays_per_sec = iters_per_sec * w * n_rays
    result = {
        "metric": "mapped rays/sec/chip (8KF x 512 rays x 512 samples, joint pose+map iter incl. backward)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "iters_per_sec": round(iters_per_sec, 2),
        "point_evals_per_sec": round(rays_per_sec * n_samples, 0),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
