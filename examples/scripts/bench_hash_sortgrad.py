#!/usr/bin/env python3
"""Sort + segment-sum vs scatter-add for the hash-table gradient.

VERDICT r4 item 3: the round-4 hash disposition (docs/PERFORMANCE.md)
evaluated one-hot matmul histograms, Pallas VMEM scatter, and bf16
tables — but not the canonical TPU embedding-gradient idiom: sort the
updates by table index, then reduce runs of equal indices with a
segmented sum, converting colliding random scatter-adds into a sort
plus a sequential reduction. This script measures that lowering at the
exact shape the hash training step issues per point-chunk
(point_chunk=131072 x 16 levels x 8 corners = 16.78M updates, F=2
features, into the 16-level concatenated table — the same op whose
scatter form measured ~1.05 s in round 4; the full iteration issues 16
such chunks).

Variants (one JSON line each, best of 3 steady-state reps):
  scatter    — the shipped lowering: zeros.at[idx].add(upd)
  sort_flat  — one lax.sort_key_val over all 16.78M updates,
               segment_sum(indices_are_sorted=True)
  sort_level — 16 per-level sorts of 1.05M updates each (indices within
               a level land in that level's table slice, so the sorts
               are independent and shorter — sort cost is
               O(n log^2 n), so 16 smaller sorts beat one big one)

Run on the one real TPU chip (serialize with other axon processes):
    python examples/scripts/bench_hash_sortgrad.py [variants_csv]
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

from loner_tpu.models.hash_encoding import (
    HashEncodingConfig,
    hash_corner_indices,
)

N_POINTS = 131072  # the hash step's point_chunk
F = 2


def make_inputs(cfg: HashEncodingConfig, key):
    k1, k2 = jax.random.split(key)
    pos01 = jax.random.uniform(k1, (N_POINTS, 3), jnp.float32)
    idx, w = hash_corner_indices(pos01, cfg)  # (N, L, 8)
    upd = (
        w[..., None] * jax.random.normal(k2, (N_POINTS, cfg.n_levels, 8, F))
    )
    return idx, upd.astype(jnp.float32)


# The axon tunnel MEMOIZES (executable, args) executions: re-running a
# jitted fn on the exact arrays it has already seen can return in
# ~0.1 ms without touching the chip (observed 2026-08-19: same scatter,
# same args 0.0001 s; fresh args 1.40 s). Every rep below therefore
# gets its own freshly generated inputs.


def grad_scatter(idx, upd, table_size):
    return jnp.zeros((table_size, F), jnp.float32).at[idx.reshape(-1)].add(
        upd.reshape(-1, F)
    )


def grad_sort_flat(idx, upd, table_size):
    flat_idx = idx.reshape(-1)
    flat_upd = upd.reshape(-1, F)
    # Sort (key, payload...) together: one fused key-value sort, no
    # post-hoc random gather.
    sorted_idx, u0, u1 = jax.lax.sort(
        (flat_idx, flat_upd[:, 0], flat_upd[:, 1]), num_keys=1
    )
    sorted_upd = jnp.stack([u0, u1], axis=-1)
    return jax.ops.segment_sum(
        sorted_upd, sorted_idx, num_segments=table_size, indices_are_sorted=True
    )


def grad_sort_level(idx, upd, cfg: HashEncodingConfig):
    """Per-level sorts: level l's indices lie in [offset_l, offset_l+size_l)."""
    offsets = cfg.level_offsets()
    sizes = cfg.level_table_sizes()
    outs = []
    for lvl in range(cfg.n_levels):
        li = idx[:, lvl, :].reshape(-1) - np.int32(offsets[lvl])
        lu = upd[:, lvl, :, :].reshape(-1, F)
        sorted_idx, u0, u1 = jax.lax.sort((li, lu[:, 0], lu[:, 1]), num_keys=1)
        outs.append(
            jax.ops.segment_sum(
                jnp.stack([u0, u1], axis=-1),
                sorted_idx,
                num_segments=int(sizes[lvl]),
                indices_are_sorted=True,
            )
        )
    return jnp.concatenate(outs, axis=0)


def grad_argsort_level(idx, upd, cfg: HashEncodingConfig):
    """Per-level argsort + payload gather (what _hash_encode_vjp_bwd
    ships): same run-reduction, but the permutation is materialized and
    the payload reordered with one gather instead of riding a
    multi-operand lax.sort. Under a GSPMD mesh the multi-operand sort
    aborts XLA:CPU inside the full phase-runner program (round-5
    finding, tests/test_mesh_sharding.py); argsort+gather partitions
    cleanly, so it is the shipped form if the chip cost is comparable."""
    offsets = cfg.level_offsets()
    sizes = cfg.level_table_sizes()
    outs = []
    for lvl in range(cfg.n_levels):
        li = idx[:, lvl, :].reshape(-1) - np.int32(offsets[lvl])
        lu = upd[:, lvl, :, :].reshape(-1, F)
        perm = jnp.argsort(li)
        outs.append(
            jax.ops.segment_sum(
                lu[perm],
                li[perm],
                num_segments=int(sizes[lvl]),
                indices_are_sorted=True,
            )
        )
    return jnp.concatenate(outs, axis=0)


def bench(fn, inputs):
    """Time fn on each input, return the best. The caller must already
    have compiled fn (and consumed inputs[0] doing so — it is excluded
    here so no timed rep can hit the memo cache)."""
    best = np.inf
    for idx, upd in inputs[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(fn(idx, upd))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    variants = (
        sys.argv[1].split(",") if len(sys.argv) > 1
        else ["scatter", "sort_level", "argsort_level", "sort_flat"]
    )
    cfg = HashEncodingConfig(
        n_levels=16, n_features_per_level=F, log2_hashmap_size=18,
        base_resolution=16,
    )
    t_size = cfg.total_table_size
    inputs = [
        jax.block_until_ready(make_inputs(cfg, jax.random.key(i)))
        for i in range(1, 5)
    ]
    n_updates = int(np.prod(inputs[0][0].shape))
    print(
        f"# {n_updates/1e6:.2f}M updates -> table ({t_size}, {F}) on "
        f"{jax.devices()[0].platform}", flush=True
    )

    fns = {
        "scatter": jax.jit(lambda i, u: grad_scatter(i, u, t_size)),
        "sort_flat": jax.jit(lambda i, u: grad_sort_flat(i, u, t_size)),
        "sort_level": jax.jit(lambda i, u: grad_sort_level(i, u, cfg)),
        "argsort_level": jax.jit(lambda i, u: grad_argsort_level(i, u, cfg)),
    }
    ref = None
    for name in variants:
        # Parity first (same input for every variant), then timing on
        # per-rep FRESH inputs (memoization note above).
        out = np.asarray(jax.block_until_ready(fns[name](*inputs[0])))
        if ref is None:
            ref, err = out, 0.0
        else:
            err = float(np.max(np.abs(out - ref)))
        t = bench(fns[name], inputs)
        print(json.dumps({
            "metric": f"hash_table_grad[{name}] updates/s",
            "value": round(n_updates / t / 1e6, 2),
            "unit": "M updates/s",
            "seconds_per_chunk": round(t, 4),
            "seconds_per_iter_16chunks": round(16 * t, 2),
            "max_abs_err_vs_first": err,
        }), flush=True)


if __name__ == "__main__":
    main()
