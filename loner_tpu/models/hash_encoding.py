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


def hash_corner_indices(pos01: jax.Array, cfg: HashEncodingConfig) -> Tuple[jax.Array, jax.Array]:
    """Corner indices and trilerp weights for all levels.

    pos01: (N, 3) in [0, 1].
    Returns (indices (N, L, 8) int32 into the concatenated table,
             weights (N, L, 8) float32).
    """
    res, sizes, offsets, dense = _level_constants(cfg)
    n_levels = cfg.n_levels

    pos01 = jnp.clip(pos01, 0.0, 1.0)
    # (N, L, 3): position scaled into each level's grid.
    scaled = pos01[:, None, :] * res[None, :, None].astype(pos01.dtype)
    # Clamp the base cell to res-1 so corners stay within [0, res]; at the
    # pos=1 boundary frac becomes exactly 1 and interpolation stays correct.
    cell = jnp.minimum(jnp.floor(scaled), (res[None, :, None] - 1).astype(pos01.dtype))
    frac = (scaled - cell).astype(jnp.float32)
    cell = cell.astype(jnp.uint32)  # (N, L, 3)

    # Build the 8 corners from per-axis factors — never materializes an
    # (N, L, 8, 3) tensor (HBM matters at 2M-point batches). Corner order:
    # index = 4*ix + 2*iy + iz.
    n = pos01.shape[0]
    c0 = cell  # (N, L, 3)
    c1 = cell + 1

    # Trilerp weights as an outer product of per-axis (1-f, f) pairs.
    wx = jnp.stack([1.0 - frac[..., 0], frac[..., 0]], axis=-1)  # (N, L, 2)
    wy = jnp.stack([1.0 - frac[..., 1], frac[..., 1]], axis=-1)
    wz = jnp.stack([1.0 - frac[..., 2], frac[..., 2]], axis=-1)
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

    This is the correctness oracle for the Pallas kernel and the fallback
    on CPU. One gather of shape (N, L, 8, F) + weighted sum.
    """
    idx, w = hash_corner_indices(pos01, cfg)
    feats = jnp.take(table, idx, axis=0)  # (N, L, 8, F)
    out = (feats * w[..., None].astype(feats.dtype)).sum(axis=2)  # (N, L, F)
    return out.reshape(pos01.shape[0], cfg.output_dim)
