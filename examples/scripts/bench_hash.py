#!/usr/bin/env python3
"""Hash-path training-step bench at reference scale (one TPU chip).

VERDICT r3 item 4: re-measure the hash parity path as a full training
step on the current toolchain (the round-1 in-session "0.77x bar" claim
is retracted — see docs/PERFORMANCE.md). This script
measures the SAME workload as bench.py (8 KF x 512 rays x 512
samples/ray joint pose+map iteration, fwd+bwd+multi-LR Adam) with the
reference's hash scene representation (16-level x 2-feature HashGrid,
log2 18, 64x1 sigma MLP — reference nerf_tcnn.py:35-38,
cfg/nerf_config/default_nerf_hash.yaml:17-27) across:

  encode_impl x sampler in {vjp_bf16, vjp_f32, xla} x {OGM, PROPOSAL}

OGM is the reference-parity sampler (occupancy voxel grid); PROPOSAL is
the flagship's proposal-MLP sampler. One JSON line per combination.
Results land in docs/PERFORMANCE.md (round-4 hash disposition).

Settled result (2026-08-19, one TPU v5e chip): ~212 rays/s = 0.003x the
bar regardless of encode impl — the backward table-gradient scatter-add
(268M colliding random adds/iter; CUDA atomicAdd territory) has no fast
TPU lowering. Expect ~3-4 min per combination at that rate. Full
analysis: docs/PERFORMANCE.md "Hash-path disposition (round 4)".
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import jax

from loner_tpu.common.jax_setup import enable_persistent_cache

enable_persistent_cache()

import jax.numpy as jnp
import numpy as np

from loner_tpu.mapping.optimizer import (
    OptimizerConfig,
    PhaseSettings,
    make_phase_runner,
)
from loner_tpu.mapping.rays import build_window_buffers
from loner_tpu.models.field import FieldConfig, MLPConfig, init_field_params
from loner_tpu.models.hash_encoding import HashEncodingConfig
from loner_tpu.models.occupancy_grid import init_occ_grid
from loner_tpu.models.proposal import init_proposal_params

BASELINE_RAYS_PER_SEC = 68_000.0


def bench_combo(encode_impl: str, strategy: str, buffers, w, n_rays, n_samples):
    cfg = OptimizerConfig(
        n_lidar_samples=n_rays, n_sky_samples=0, n_samples_per_ray=n_samples,
        window_size=w, ray_range=(1.0, 10.0), samples_strategy=strategy,
        # point_chunk MUST stay on for the hash field at this scale: the
        # unchunked forward gather materializes f32[2, 2.1M, 16, 8] = 34 GB
        # (> HBM) and the compile-time OOM kills the remote compile helper.
        # k=1 dispatch keeps the live set to one iteration's buffers.
        lr_sigma=0.01, steps_per_dispatch=1, point_chunk=131072,
        prop_n_ctrl=33, prop_train_subsample=8,
        encode_impl=encode_impl,
    )
    field_cfg = FieldConfig(
        encoding_sigma="hash",
        pos_encoding_sigma=HashEncodingConfig(
            n_levels=16, n_features_per_level=2, log2_hashmap_size=18,
            base_resolution=16,
        ),
        sigma_mlp=MLPConfig(n_neurons=64, n_hidden_layers=1, output_dim=1),
        density_activation="relu", compute_dtype=jnp.bfloat16,
        pos_encoding_intensity=HashEncodingConfig(
            n_levels=16, n_features_per_level=2, log2_hashmap_size=19,
        ),
    )
    params = init_field_params(jax.random.key(0), field_cfg)
    if strategy == "PROPOSAL":
        sampler_state = init_proposal_params(jax.random.key(5), cfg.proposal)
    else:
        sampler_state = init_occ_grid(cfg.occ_voxel_size)
    rng = np.random.default_rng(1)
    twists = jnp.asarray(rng.normal(0, 0.02, (w, 6)).astype(np.float32))
    phase = PhaseSettings(
        num_iterations=1, freeze_poses=False, freeze_sigma_mlp=False
    )
    runner = make_phase_runner(
        cfg, field_cfg, phase, w, buffers.dirs.shape[1], buffers.sky_dirs.shape[1]
    )

    t0 = time.perf_counter()
    out = runner(
        params, sampler_state, twists, buffers, jnp.ones((w,), jnp.float32),
        jnp.asarray(12.0, jnp.float32), jnp.zeros(3, jnp.float32),
        0, jax.random.key(1), num_iterations=1,
    )
    np.asarray(out[3])
    compile_s = time.perf_counter() - t0

    rates = []
    for seed in (1, 2, 3):
        t0 = time.perf_counter()
        out = runner(
            out[0], out[1], out[2], buffers, jnp.ones((w,), jnp.float32),
            jnp.asarray(12.0, jnp.float32), jnp.zeros(3, jnp.float32),
            seed * 10, jax.random.key(seed), num_iterations=5,
        )
        np.asarray(out[3])
        rates.append(5 / (time.perf_counter() - t0))
    best = max(rates)
    rays_per_sec = best * w * n_rays
    rec = {
        "metric": f"hash[{encode_impl}]+{strategy} mapped rays/s",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "iters_per_sec": round(best, 2),
        "all_rates": [round(r, 2) for r in rates],
        "compile_s": round(compile_s, 1),
        "final_loss": float(np.asarray(out[3])[-1]),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    w, n_rays, n_samples = 8, 512, 512
    rng = np.random.default_rng(0)
    dirs, depths = [], []
    for _ in range(w):
        d = rng.normal(size=(3, 65536))
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        dirs.append(d.astype(np.float32))
        depths.append(rng.uniform(1.5, 9.5, 65536).astype(np.float32))
    buffers = build_window_buffers(dirs, depths, [None] * w, w)

    impls = (sys.argv[1].split(",") if len(sys.argv) > 1
             else ["vjp_bf16", "vjp_f32", "xla"])
    strategies = (sys.argv[2].split(",") if len(sys.argv) > 2
                  else ["OGM", "PROPOSAL"])
    for impl in impls:
        for strat in strategies:
            try:
                bench_combo(impl, strat, buffers, w, n_rays, n_samples)
            except Exception as e:  # keep the matrix going; record the failure
                print(json.dumps({
                    "metric": f"hash[{impl}]+{strat}",
                    "error": f"{type(e).__name__}: {e}"[:300],
                }), flush=True)


if __name__ == "__main__":
    main()
