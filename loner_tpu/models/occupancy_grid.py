"""Occupancy grid: a learnable 3D log-odds field guiding sample placement.

TPU-native counterpart of the reference's OccupancyGridModel
(src/models/model_tcnn.py:108-131) and its SGD update
(src/mapping/optimizer.py:598-609, src/models/losses.py:54-62). The grid
is a plain ``(V, V, V)`` f32 array of logits; trilinear interpolation
matches torch ``grid_sample(..., align_corners=False)`` on [-1, 1]
coordinates; the update uses jax.vjp of the interpolation, which is
exactly the reference's ``point_logits.backward(gradient=g)`` + SGD step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def init_occ_grid(voxel_size: int = 100, dtype=jnp.float32) -> jax.Array:
    """Zero logits: p(occupied) = 0.5 everywhere."""
    return jnp.zeros((voxel_size, voxel_size, voxel_size), dtype=dtype)


def interpolate_occ_logits(grid: jax.Array, points: jax.Array) -> jax.Array:
    """Trilinear interpolation of logits at points in [-1, 1]^3.

    grid: (V, V, V); points: (..., 3) ordered (x, y, z) like the renderer's
    sample positions; torch grid_sample convention: x indexes the LAST grid
    axis. align_corners=False: voxel centers at (i + 0.5)/V mapped to
    [-1, 1]; out-of-range contributions are zero-padded (torch's default
    padding_mode).
    """
    v = grid.shape[0]
    shape = points.shape[:-1]
    p = points.reshape(-1, 3)
    # [-1,1] -> continuous voxel coords with centers at integers.
    coords = (p + 1.0) * 0.5 * v - 0.5  # (N, 3) in x,y,z order
    # grid_sample: x -> axis 2 (W), y -> axis 1 (H), z -> axis 0 (D)
    cx, cy, cz = coords[:, 0], coords[:, 1], coords[:, 2]

    def lerp_axis(c, size):
        c0 = jnp.floor(c)
        frac = c - c0
        c0i = c0.astype(jnp.int32)
        c1i = c0i + 1
        valid0 = (c0i >= 0) & (c0i <= size - 1)
        valid1 = (c1i >= 0) & (c1i <= size - 1)
        return (
            jnp.clip(c0i, 0, size - 1),
            jnp.clip(c1i, 0, size - 1),
            frac,
            valid0,
            valid1,
        )

    x0, x1, fx, vx0, vx1 = lerp_axis(cx, v)
    y0, y1, fy, vy0, vy1 = lerp_axis(cy, v)
    z0, z1, fz, vz0, vz1 = lerp_axis(cz, v)

    def g(zi, yi, xi, valid):
        # zero padding outside the grid (torch grid_sample default).
        return jnp.where(valid, grid[zi, yi, xi], 0.0)

    out = (
        g(z0, y0, x0, vz0 & vy0 & vx0) * (1 - fz) * (1 - fy) * (1 - fx)
        + g(z0, y0, x1, vz0 & vy0 & vx1) * (1 - fz) * (1 - fy) * fx
        + g(z0, y1, x0, vz0 & vy1 & vx0) * (1 - fz) * fy * (1 - fx)
        + g(z0, y1, x1, vz0 & vy1 & vx1) * (1 - fz) * fy * fx
        + g(z1, y0, x0, vz1 & vy0 & vx0) * fz * (1 - fy) * (1 - fx)
        + g(z1, y0, x1, vz1 & vy0 & vx1) * fz * (1 - fy) * fx
        + g(z1, y1, x0, vz1 & vy1 & vx0) * fz * fy * (1 - fx)
        + g(z1, y1, x1, vz1 & vy1 & vx1) * fz * fy * fx
    )
    return out.reshape(shape)


def occ_grid_update(
    grid: jax.Array,
    points: jax.Array,
    logits_grad: jax.Array,
    lr: float,
) -> jax.Array:
    """One SGD step on the grid given upstream gradients at sample points.

    Equivalent to the reference's
    ``interpolate(...).backward(gradient=logits_grad); SGD.step()``
    (optimizer.py:598-609): vjp of the interpolation scatters each point's
    gradient onto its 8 surrounding voxels with trilerp weights.
    """
    _, vjp = jax.vjp(lambda g: interpolate_occ_logits(g, points), grid)
    (grid_grad,) = vjp(logits_grad)
    return grid - lr * grid_grad
