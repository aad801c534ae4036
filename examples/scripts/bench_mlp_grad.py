#!/usr/bin/env python3
"""A/B: sigma-MLP backward implementation at reference scale, one session.

Round-5 measurement for the bf16-cotangent MLP VJP (VERDICT r4 item 2 —
"the realistic single-chip headroom on this toolchain is the backward
pass's f32 cotangent streams"). Runs the FULL flagship training step
(8 KF x 512 rays x 512 samples, joint pose+map iteration incl. backward
and the masked multi-LR Adam update) back-to-back with
``mlp_grad: xla`` (plain autodiff — the pre-round-5 behavior) and
``mlp_grad: vjp`` (hand-written backward, hidden cotangents in bf16,
f32 dW/db accumulation) in ONE process, so tunnel state is comparable
(docs/PERFORMANCE.md: A/Bs must be back-to-back).

Usage: python examples/scripts/bench_mlp_grad.py [reps_per_variant]
Prints one JSON line per variant plus a summary line.
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

from loner_tpu.mapping.optimizer import OptimizerConfig, PhaseSettings, make_phase_runner
from loner_tpu.mapping.rays import build_window_buffers
from loner_tpu.models.field import FieldConfig, FourierConfig, MLPConfig, init_field_params
from loner_tpu.models.hash_encoding import HashEncodingConfig
from loner_tpu.models.proposal import init_proposal_params


def run_variant(mlp_grad: str, buffers, reps: int) -> dict:
    w, n_rays, n_samples = 8, 512, 512
    cfg = OptimizerConfig(
        n_lidar_samples=n_rays, n_sky_samples=0, n_samples_per_ray=n_samples,
        window_size=w, ray_range=(1.0, 10.0), samples_strategy="PROPOSAL",
        lr_sigma=0.005, steps_per_dispatch=10, prop_n_ctrl=33, point_chunk=0,
        prop_train_subsample=8,
    )
    field_cfg = FieldConfig(
        encoding_sigma="fourier",
        fourier_sigma=FourierConfig(n_freqs=48, scale=6.0),
        sigma_mlp=MLPConfig(n_neurons=256, n_hidden_layers=2, output_dim=1),
        density_activation="softplus", sigma_mlp_bias=True,
        compute_dtype=jnp.bfloat16, sigma_kernel="xla", mlp_grad=mlp_grad,
        pos_encoding_intensity=HashEncodingConfig(log2_hashmap_size=19),
    )
    rng = np.random.default_rng(0)
    params = init_field_params(jax.random.key(0), field_cfg)
    prop = init_proposal_params(jax.random.key(5), cfg.proposal)
    twists = jnp.asarray(rng.normal(0, 0.02, (w, 6)).astype(np.float32))
    phase = PhaseSettings(num_iterations=1, freeze_poses=False, freeze_sigma_mlp=False)
    runner = make_phase_runner(
        cfg, field_cfg, phase, w, buffers.dirs.shape[1], buffers.sky_dirs.shape[1]
    )

    t0 = time.perf_counter()
    out = runner(
        params, prop, twists, buffers, jnp.ones((w,), jnp.float32),
        jnp.asarray(12.0, jnp.float32), jnp.zeros(3, jnp.float32),
        0, jax.random.key(1), num_iterations=10,
    )
    np.asarray(out[3])
    compile_s = time.perf_counter() - t0
    print(f"[{mlp_grad}] compiled+warm in {compile_s:.1f}s", file=sys.stderr, flush=True)

    rates = []
    for seed in range(2, 2 + reps):
        t0 = time.perf_counter()
        out = runner(
            out[0], out[1], out[2], buffers, jnp.ones((w,), jnp.float32),
            jnp.asarray(12.0, jnp.float32), jnp.zeros(3, jnp.float32),
            seed, jax.random.key(seed), num_iterations=10,
        )
        np.asarray(out[3])
        rates.append(10 / (time.perf_counter() - t0))
        print(f"[{mlp_grad}] window {seed - 1}: {rates[-1]:.2f} it/s",
              file=sys.stderr, flush=True)
    best = max(rates)
    res = {
        "variant": f"mlp_grad={mlp_grad}",
        "best_it_per_s": round(best, 2),
        "best_rays_per_s": round(best * w * n_rays, 1),
        "all_it_per_s": [round(r, 2) for r in rates],
        "final_loss": float(np.asarray(out[3]).ravel()[-1]),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(res), flush=True)
    return res


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    w = 8
    rng = np.random.default_rng(0)
    dirs, depths = [], []
    for _ in range(w):
        d = rng.normal(size=(3, 65536))
        d /= np.linalg.norm(d, axis=0, keepdims=True)
        dirs.append(d.astype(np.float32))
        depths.append(rng.uniform(1.5, 9.5, 65536).astype(np.float32))
    buffers = build_window_buffers(dirs, depths, [None] * w, w)

    # xla first (the incumbent), vjp second, then xla again to detect
    # tunnel drift inside the session.
    a = run_variant("xla", buffers, reps)
    b = run_variant("vjp", buffers, reps)
    a2 = run_variant("xla", buffers, max(2, reps // 2))
    speedup = b["best_it_per_s"] / max(a["best_it_per_s"], a2["best_it_per_s"])
    print(json.dumps({
        "summary": "mlp_grad vjp vs xla, full flagship step",
        "xla_best_it_per_s": max(a["best_it_per_s"], a2["best_it_per_s"]),
        "vjp_best_it_per_s": b["best_it_per_s"],
        "speedup": round(speedup, 3),
        "loss_delta": abs(a["final_loss"] - b["final_loss"]),
    }), flush=True)


if __name__ == "__main__":
    main()
