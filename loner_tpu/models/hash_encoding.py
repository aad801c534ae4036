"""Multiresolution hash-grid encoding in JAX, TPU-layout-aware.

TPU-native replacement for tiny-cuda-nn's HashGrid encoding (used by the
reference at src/models/nerf_tcnn.py:35-52 with the configs in
cfg/nerf_config/default_nerf_hash.yaml). Semantics follow Instant-NGP:

  * L levels of 3D grids with geometrically growing resolution
    ``N_l = floor(base * b^l)``
  * levels whose dense vertex count fits in the table are indexed densely;
    finer levels use the xor-of-primes spatial hash
  * per-level F features, trilinearly interpolated at the 8 cell corners
  * all levels' tables are concatenated so lookups are single gathers

LAYOUT (the load-bearing design decision): TPU tiles pad the minor-most
dimension of every array to 128 lanes. A naive (N, L, 8) index/weight
tensor is padded 16x in HBM — measured as the difference between an
OOM-at-34GB program and a 2GB one. So every large elementwise
intermediate here is POINT-MINOR: indices and trilerp weights are
(L*8, N). The table stays (T, F): the TPU compiler hangs on gathers from
1-D operands (measured), so lookups are slice-gathers along the trailing
feature dim and XLA chooses the intermediate layout. The spatial-hash
modulo is a STATIC and-mask (2^log2 table sizes) — a runtime-vector
modulo also hangs the compiler. The row-major ``hash_encode`` keeps the
friendly (N, 3) -> (N, L*F) API by transposing at the boundary; the hot
path calls ``hash_encode_t`` directly.

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
    """(T_total, F) table, uniform in [-1e-4, 1e-4] (tcnn's init).

    The trailing feature dim matters: the TPU compiler hangs on gathers
    from 1-D operands but lowers (T, F) slice-gathers fine.
    """
    return jax.random.uniform(
        key,
        (cfg.total_table_size, cfg.n_features_per_level),
        minval=-1e-4,
        maxval=1e-4,
        dtype=dtype,
    )


def _level_constants(cfg: HashEncodingConfig):
    res = jnp.asarray(cfg.level_resolutions(), dtype=jnp.uint32)
    sizes = jnp.asarray(cfg.level_table_sizes(), dtype=jnp.uint32)
    offsets = jnp.asarray(cfg.level_offsets()[:-1], dtype=jnp.uint32)
    dense = jnp.asarray(
        (cfg.level_resolutions() + 1) ** 3 <= 2 ** cfg.log2_hashmap_size
    )
    return res, sizes, offsets, dense


def hash_corner_indices_t(
    pos_t: jax.Array, cfg: HashEncodingConfig
) -> Tuple[jax.Array, jax.Array]:
    """Corner indices and trilerp weights, point-minor layout.

    pos_t: (3, N) in [0, 1].
    Returns (indices (L*8, N) int32, weights (L*8, N) float32); corner
    order within a level is ``4*ix + 2*iy + iz``.
    """
    res, sizes, offsets, dense = _level_constants(cfg)
    n_levels = cfg.n_levels
    n = pos_t.shape[1]
    # The spatial hash is modulo the table size — 2^log2 exactly, so a
    # STATIC AND mask (runtime-vector modulo hangs the TPU compiler).
    hash_mask = jnp.uint32(2 ** cfg.log2_hashmap_size - 1)

    pos_t = jnp.clip(pos_t, 0.0, 1.0)
    # (L, 3, N): positions scaled into each level's grid.
    scaled = pos_t[None, :, :] * res[:, None, None].astype(pos_t.dtype)
    # Clamp the base cell to res-1 so corners stay within [0, res]; at the
    # pos=1 boundary frac becomes exactly 1 and interpolation stays correct.
    cell = jnp.minimum(jnp.floor(scaled), (res[:, None, None] - 1).astype(pos_t.dtype))
    frac = (scaled - cell).astype(jnp.float32)
    cell = cell.astype(jnp.uint32)
    c0, c1 = cell, cell + 1  # (L, 3, N)

    r1 = (res + 1)[:, None]  # (L, 1)
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    dense_mask = dense[:, None]
    offs = offsets[:, None]

    # Unrolled 8 corners (ix, iy, iz in {0,1}), corner index 4ix + 2iy + iz.
    idx_corners, w_corners = [], []
    for ix in (0, 1):
        cx = c1[:, 0] if ix else c0[:, 0]
        wxc = fx if ix else 1.0 - fx
        for iy in (0, 1):
            cy = c1[:, 1] if iy else c0[:, 1]
            wyc = fy if iy else 1.0 - fy
            for iz in (0, 1):
                cz = c1[:, 2] if iz else c0[:, 2]
                wzc = fz if iz else 1.0 - fz
                dense_i = cx + cy * r1 + cz * (r1 * r1)
                hash_i = (
                    cx * jnp.uint32(_PRIMES[0])
                    ^ cy * jnp.uint32(_PRIMES[1])
                    ^ cz * jnp.uint32(_PRIMES[2])
                ) & hash_mask
                idx_corners.append(jnp.where(dense_mask, dense_i, hash_i) + offs)
                w_corners.append(wxc * wyc * wzc)

    # (L, 8, N) -> (L*8, N); corner is the middle axis.
    idx = jnp.stack(idx_corners, axis=1).reshape(n_levels * 8, n)
    w = jnp.stack(w_corners, axis=1).reshape(n_levels * 8, n)
    return idx.astype(jnp.int32), w


def hash_encode_t(table: jax.Array, pos_t: jax.Array, cfg: HashEncodingConfig) -> jax.Array:
    """Encode (3, N) positions -> (L*F, N) features, point-minor.

    One slice-gather from the (T, F) table; corner reduction over the
    middle axis of the (L, 8, N, F) view. Output row order is level-major,
    feature-minor: row ``l*F + f``.
    """
    idx, w = hash_corner_indices_t(pos_t, cfg)  # (L8, N)
    n_levels, f_dim = cfg.n_levels, cfg.n_features_per_level
    n = pos_t.shape[1]
    feats = jnp.take(table, idx, axis=0)  # (L8, N, F)
    out = (feats * w[..., None]).reshape(n_levels, 8, n, f_dim).sum(axis=1)
    # (L, N, F) -> (L, F, N) -> (L*F, N), row l*F+f.
    return jnp.moveaxis(out, -1, 1).reshape(n_levels * f_dim, n)


def hash_encode(table: jax.Array, pos01: jax.Array, cfg: HashEncodingConfig) -> jax.Array:
    """Row-major convenience API: (N, 3) -> (N, L*F).

    Transposes at the boundary; all heavy intermediates stay point-minor.
    """
    return hash_encode_t(table, pos01.T, cfg).T


def hash_corner_indices(pos01: jax.Array, cfg: HashEncodingConfig):
    """Row-major index/weight API (tests, tooling): (N, L, 8) x2."""
    idx, w = hash_corner_indices_t(pos01.T, cfg)
    n = pos01.shape[0]
    return (
        idx.reshape(cfg.n_levels, 8, n).transpose(2, 0, 1),
        w.reshape(cfg.n_levels, 8, n).transpose(2, 0, 1),
    )
