"""Multiresolution hash-grid encoding in JAX.

TPU-native replacement for tiny-cuda-nn's HashGrid encoding (used by the
reference at src/models/nerf_tcnn.py:35-52 with the configs in
cfg/nerf_config/default_nerf_hash.yaml). Semantics follow Instant-NGP:

  * L levels of 3D grids with geometrically growing resolution
    ``N_l = floor(base * b^l)``
  * levels whose dense vertex count fits in the table are indexed densely;
    finer levels use the xor-of-primes spatial hash
  * per-level F features, trilinearly interpolated at the 8 cell corners
  * all levels' tables are stored CONCATENATED in one ``(T_total, F)``
    array so the lookup is a single gather per corner — XLA fuses the
    trilerp arithmetic around it, and the Pallas fast path
    (loner_tpu/ops/pallas) can DMA level-blocks explicitly.

Inputs are in [0, 1]^3 (callers map the world cube's [-1,1] down, same as
reference nerf_tcnn.py:63). Out-of-range inputs clamp.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Primes from Instant-NGP's spatial hash (Teschner et al. 2003).
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashEncodingConfig:
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 18
    base_resolution: int = 16
    per_level_scale: float = 2.0  # tcnn's HashGrid default growth factor

    @staticmethod
    def from_settings(cfg: dict) -> "HashEncodingConfig":
        return HashEncodingConfig(
            n_levels=int(cfg.get("n_levels", 16)),
            n_features_per_level=int(cfg.get("n_features_per_level", 2)),
            log2_hashmap_size=int(cfg.get("log2_hashmap_size", 18)),
            base_resolution=int(cfg.get("base_resolution", 16)),
            per_level_scale=float(cfg.get("per_level_scale", 2.0)),
        )

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_resolutions(self) -> np.ndarray:
        return np.floor(
            self.base_resolution * self.per_level_scale ** np.arange(self.n_levels)
        ).astype(np.int64)

    def level_table_sizes(self) -> np.ndarray:
        """Entries per level: dense (res+1)^3 when it fits, else 2^log2."""
        res = self.level_resolutions()
        dense = (res + 1) ** 3
        return np.minimum(dense, 2 ** self.log2_hashmap_size).astype(np.int64)

    def level_offsets(self) -> np.ndarray:
        """Start offsets of each level inside the concatenated table."""
        sizes = self.level_table_sizes()
        return np.concatenate([[0], np.cumsum(sizes)])

    @property
    def total_table_size(self) -> int:
        return int(self.level_table_sizes().sum())


def init_hash_table(key: jax.Array, cfg: HashEncodingConfig, dtype=jnp.float32) -> jax.Array:
    """(T_total, F) table, uniform in [-1e-4, 1e-4] (tcnn's init)."""
    return jax.random.uniform(
        key,
        (cfg.total_table_size, cfg.n_features_per_level),
        minval=-1e-4,
        maxval=1e-4,
        dtype=dtype,
    )


def _level_constants(cfg: HashEncodingConfig) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Static per-level constants as arrays: resolution, table size, offset, dense flag."""
    res = jnp.asarray(cfg.level_resolutions(), dtype=jnp.uint32)
    sizes = jnp.asarray(cfg.level_table_sizes(), dtype=jnp.uint32)
    offsets = jnp.asarray(cfg.level_offsets()[:-1], dtype=jnp.uint32)
    dense = jnp.asarray(
        (cfg.level_resolutions() + 1) ** 3 <= 2 ** cfg.log2_hashmap_size
    )
    return res, sizes, offsets, dense


def _corner_geometry(pos01: jax.Array, cfg: HashEncodingConfig):
    """Shared cell/fraction geometry for all levels.

    pos01: (N, 3), clipped to [0, 1] internally.
    Returns (cell (N, L, 3) uint32, frac (N, L, 3) f32,
             (wx, wy, wz) per-axis (N, L, 2) weight pairs).
    """
    res, _, _, _ = _level_constants(cfg)
    pos01 = jnp.clip(pos01, 0.0, 1.0)
    # (N, L, 3): position scaled into each level's grid.
    scaled = pos01[:, None, :] * res[None, :, None].astype(pos01.dtype)
    # Clamp the base cell to res-1 so corners stay within [0, res]; at the
    # pos=1 boundary frac becomes exactly 1 and interpolation stays correct.
    cell = jnp.minimum(jnp.floor(scaled), (res[None, :, None] - 1).astype(pos01.dtype))
    frac = (scaled - cell).astype(jnp.float32)
    cell = cell.astype(jnp.uint32)  # (N, L, 3)

    # Per-axis (1-f, f) pairs; the trilerp weight of corner (ix, iy, iz) is
    # wx[ix] * wy[iy] * wz[iz] with corner order index = 4*ix + 2*iy + iz.
    wx = jnp.stack([1.0 - frac[..., 0], frac[..., 0]], axis=-1)  # (N, L, 2)
    wy = jnp.stack([1.0 - frac[..., 1], frac[..., 1]], axis=-1)
    wz = jnp.stack([1.0 - frac[..., 2], frac[..., 2]], axis=-1)
    return cell, frac, (wx, wy, wz)


def hash_corner_indices(pos01: jax.Array, cfg: HashEncodingConfig) -> Tuple[jax.Array, jax.Array]:
    """Corner indices and trilerp weights for all levels.

    pos01: (N, 3) in [0, 1].
    Returns (indices (N, L, 8) int32 into the concatenated table,
             weights (N, L, 8) float32).
    """
    res, sizes, offsets, dense = _level_constants(cfg)
    n_levels = cfg.n_levels
    n = pos01.shape[0]

    cell, _, (wx, wy, wz) = _corner_geometry(pos01, cfg)
    c0 = cell  # (N, L, 3)
    c1 = cell + 1

    # Trilerp weights as an outer product of per-axis (1-f, f) pairs —
    # never materializes an (N, L, 8, 3) corner tensor (HBM matters at
    # 2M-point batches).
    w = (
        wx[..., :, None, None] * wy[..., None, :, None] * wz[..., None, None, :]
    ).reshape(n, n_levels, 8)

    r1 = (res + 1)[None, :]  # (1, L)
    # Per-axis index contributions, combined by broadcasting to (N, L, 2, 2, 2).
    dx = jnp.stack([c0[..., 0], c1[..., 0]], axis=-1)  # (N, L, 2)
    dy = jnp.stack([c0[..., 1], c1[..., 1]], axis=-1) * r1[..., None]
    dz = jnp.stack([c0[..., 2], c1[..., 2]], axis=-1) * (r1 * r1)[..., None]
    dense_idx = (
        dx[..., :, None, None] + dy[..., None, :, None] + dz[..., None, None, :]
    ).reshape(n, n_levels, 8)

    hx = jnp.stack([c0[..., 0], c1[..., 0]], axis=-1) * jnp.uint32(_PRIMES[0])
    hy = jnp.stack([c0[..., 1], c1[..., 1]], axis=-1) * jnp.uint32(_PRIMES[1])
    hz = jnp.stack([c0[..., 2], c1[..., 2]], axis=-1) * jnp.uint32(_PRIMES[2])
    # Static AND mask instead of modulo: hashed levels have exactly
    # 2^log2 entries, and a runtime-vector modulo hangs the TPU compiler.
    hash_mask = jnp.uint32(2 ** cfg.log2_hashmap_size - 1)
    hash_idx = (
        hx[..., :, None, None] ^ hy[..., None, :, None] ^ hz[..., None, None, :]
    ).reshape(n, n_levels, 8) & hash_mask

    idx = jnp.where(dense[None, :, None], dense_idx, hash_idx)
    idx = idx + offsets[None, :, None]
    return idx.astype(jnp.int32), w


def hash_encode(table: jax.Array, pos01: jax.Array, cfg: HashEncodingConfig) -> jax.Array:
    """Encode (N, 3) positions -> (N, L*F) features (pure XLA path).

    This is the correctness oracle for the fast paths and the fallback on
    CPU. One gather of shape (N, L, 8, F) + weighted sum.
    """
    idx, w = hash_corner_indices(pos01, cfg)
    feats = jnp.take(table, idx, axis=0)  # (N, L, 8, F)
    out = (feats * w[..., None].astype(feats.dtype)).sum(axis=2)  # (N, L, F)
    return out.reshape(pos01.shape[0], cfg.output_dim)


# ---------------------------------------------------------------------------
# Training fast path: custom VJP with saved corner features
# ---------------------------------------------------------------------------
#
# Autodiff of ``hash_encode`` under ``jax.checkpoint`` costs THREE random
# HBM passes over the table per training step (forward gather, remat
# re-gather, backward scatter-add) — and random gathers are the dominant
# HBM traffic of the whole mapping iteration (each 8-byte corner entry
# costs a full padded lane-row read). tiny-cuda-nn avoids this by fusing
# the whole encode+MLP fwd/bwd into one CUDA kernel (reference
# src/models/nerf_tcnn.py:35-52). The TPU-native equivalent here:
#
#   * forward gathers once, optionally in bfloat16 (halves gather bytes),
#     and SAVES the gathered corner features packed as (N, L*8*F) — a
#     sequential, unpadded write that is ~60x cheaper than re-gathering
#   * backward recomputes indices/weights from positions (pure VPU
#     arithmetic, no HBM traffic), reads the saved features sequentially,
#     and does exactly ONE random pass: the scatter-add of table grads,
#     accumulated in float32 regardless of compute dtype
#   * position gradients (pose optimization flows through the trilerp
#     weights) use the closed form dL/dfrac_x = sum_{iy,iz}
#     (s[1,iy,iz] - s[0,iy,iz]) * wy[iy] * wz[iz] with
#     s_k = <feats_k, dL/dout> — no autodiff graph at all.
#
# Net: 2 random passes instead of 3, each optionally half-width.
#
# Measured envelope (round 4, TPU v5e, healthy-tunnel session): the one
# remaining random pass — the table-gradient scatter-add — is the wall.
# XLA serializes colliding-index scatter to ~10M updates/s, and a
# reference-scale training iteration needs ~268M of them, so the full
# hash training step runs ~0.05 it/s (vs the flagship Fourier field's
# 34.5 it/s, whose gradients are dense matmuls). TPU has no atomicAdd;
# no lowering we evaluated (one-hot matmul histogram, Pallas VMEM scalar
# scatter, bf16 tables) closes the gap — full analysis in
# docs/PERFORMANCE.md "Hash-path disposition (round 4)". The hash path
# is therefore the schema-compatible parity/inference path, not a
# training fast path, on this hardware.


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def hash_encode_vjp(
    table: jax.Array,
    pos01: jax.Array,
    cfg: HashEncodingConfig,
    compute_dtype=jnp.bfloat16,
    residual_dtype=jnp.bfloat16,
) -> jax.Array:
    """Training encode: same semantics as ``hash_encode`` (features cast to
    ``compute_dtype`` before the trilerp), hand-written VJP."""
    out, _ = _hash_encode_vjp_fwd(table, pos01, cfg, compute_dtype, residual_dtype)
    return out


def _hash_encode_vjp_fwd(table, pos01, cfg, compute_dtype, residual_dtype):
    n = pos01.shape[0]
    l8 = cfg.n_levels * 8
    idx, w = hash_corner_indices(pos01, cfg)
    tq = table.astype(compute_dtype) if table.dtype != compute_dtype else table
    feats = jnp.take(tq, idx.reshape(n, l8), axis=0)  # (N, L8, F)
    wf = w.reshape(n, l8, 1).astype(feats.dtype)
    out = (
        (feats * wf)
        .reshape(n, cfg.n_levels, 8, cfg.n_features_per_level)
        .sum(axis=2)
        .reshape(n, cfg.output_dim)
        .astype(jnp.float32)
    )
    # Packed (N, L*8*F) residual: minor dim 128*F — no tile padding.
    # Saving ``table`` itself is free (no copy — it is live anyway) and
    # carries its shape/dtype into the backward pass.
    res_feats = feats.reshape(n, l8 * cfg.n_features_per_level).astype(residual_dtype)
    return out, (table, pos01, res_feats)


def _hash_encode_vjp_bwd(cfg, compute_dtype, residual_dtype, res, g):
    table, pos01, res_feats = res
    table_shape, table_dtype = table.shape, table.dtype
    n = pos01.shape[0]
    n_levels, f_dim = cfg.n_levels, cfg.n_features_per_level
    res_arr, _, _, _ = _level_constants(cfg)

    idx, w = hash_corner_indices(pos01, cfg)  # recomputed: VPU-only
    gl = g.reshape(n, n_levels, 1, f_dim).astype(jnp.float32)

    # Table gradient, float32 accumulation — per-level sort + segmented
    # sum, the canonical TPU embedding-gradient idiom. A flat
    # scatter-add serializes on colliding indices (~12M updates/s
    # measured); sorting each level's updates by table index and
    # reducing runs with segment_sum(indices_are_sorted=True) runs ~6x
    # faster and is bit-exact vs the scatter
    # (examples/scripts/bench_hash_sortgrad.py, round 5; per-LEVEL
    # sorts — 16 x 1.05M — beat one flat 16.8M sort, whose O(n log^2 n)
    # cost erases the win). The sort rides jnp.argsort + one payload
    # gather rather than a multi-operand lax.sort: inside the full
    # sharded phase-runner program the multi-operand form aborts
    # XLA:CPU under a GSPMD mesh (tests/test_mesh_sharding.py caught
    # it; a minimal sort+segment_sum repro does NOT trigger the abort),
    # while argsort+gather partitions cleanly at comparable chip cost
    # (both variants' rows in the bench script).
    upd = w[..., None] * gl  # (N, L, 8, F)
    offsets = cfg.level_offsets()
    sizes = cfg.level_table_sizes()
    level_grads = []
    for lvl in range(n_levels):
        li = idx[:, lvl, :].reshape(-1) - np.int32(offsets[lvl])
        lu = upd[:, lvl, :, :].reshape(-1, f_dim)
        perm = jnp.argsort(li)
        level_grads.append(
            jax.ops.segment_sum(
                lu[perm],
                li[perm],
                num_segments=int(sizes[lvl]),
                indices_are_sorted=True,
            )
        )
    dtable = jnp.concatenate(level_grads, axis=0).astype(table_dtype)
    assert dtable.shape == table_shape

    # Position gradient through the trilerp weights.
    feats = res_feats.reshape(n, n_levels, 8, f_dim).astype(jnp.float32)
    s = (feats * gl).sum(-1).reshape(n, n_levels, 2, 2, 2)  # corner scalars
    _, _, (wx, wy, wz) = _corner_geometry(pos01, cfg)
    wyz = wy[..., :, None] * wz[..., None, :]  # (N, L, 2, 2)
    wxz = wx[..., :, None] * wz[..., None, :]
    wxy = wx[..., :, None] * wy[..., None, :]
    dfx = ((s[:, :, 1] - s[:, :, 0]) * wyz).sum((-2, -1))  # (N, L)
    dfy = ((s[:, :, :, 1] - s[:, :, :, 0]) * wxz).sum((-2, -1))
    dfz = ((s[..., 1] - s[..., 0]) * wxy).sum((-2, -1))
    dfrac = jnp.stack([dfx, dfy, dfz], axis=-1)  # (N, L, 3)
    # d scaled / d pos01 = res_l; zero where the input clip was active.
    dpos01 = (dfrac * res_arr[None, :, None].astype(jnp.float32)).sum(axis=1)
    # Clip subgradient convention: full weight strictly inside [0, 1],
    # half at an exact boundary (matches jnp.clip autodiff at ties), zero
    # outside.
    clip_w = (
        ((pos01 > 0.0) & (pos01 < 1.0)).astype(jnp.float32)
        + 0.5 * ((pos01 == 0.0) | (pos01 == 1.0)).astype(jnp.float32)
    )
    dpos01 = (dpos01 * clip_w).astype(pos01.dtype)
    return dtable, dpos01


hash_encode_vjp.defvjp(_hash_encode_vjp_fwd, _hash_encode_vjp_bwd)


def hash_encode_train(compute_dtype=jnp.bfloat16, residual_dtype=jnp.bfloat16):
    """An ``encode_fn`` (table, pos01, cfg) -> (N, L*F) for the training
    path: the custom-VJP encode with the given compute/residual dtypes."""

    def encode(table, pos01, cfg):
        return hash_encode_vjp(table, pos01, cfg, compute_dtype, residual_dtype)

    return encode
