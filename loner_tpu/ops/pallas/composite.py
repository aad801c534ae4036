"""Pallas TPU kernel: fused alpha compositing over ray samples.

Fuses the volume-rendering chain of ``raw2outputs``
(loner_tpu/models/rendering.py, mirroring reference
rendering_tcnn.py:71-147) — deltas, alpha, transmittance cumprod, weights,
far-residual depth, opacity, variance — into ONE VMEM-resident pass over a
tile of rays. The XLA version materializes several (B, S) intermediates in
HBM; the kernel reads sigma/z once and writes only the per-ray outputs
(weights optionally), so it is HBM-minimal. Used on the inference/analysis
paths (test-time rendering runs 2048 samples/ray); training keeps the XLA
path for autodiff.

Ray tiles: (TILE_B, S) with S a multiple of 128 (512 train / 2048 test).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 256


def _composite_kernel(z_ref, sigma_ref, far_ref, dnorm_ref,
                      depth_ref, opacity_ref, var_ref, weights_ref,
                      *, softplus: bool):
    z = z_ref[:]          # (TILE_B, S)
    sigma = sigma_ref[:]  # (TILE_B, S)
    far = far_ref[:]      # (TILE_B, 1)
    dnorm = dnorm_ref[:]  # (TILE_B, 1) |ray_d|

    s = z.shape[1]
    # deltas: diff along samples, last delta = inf (reference semantics).
    z_next = jnp.concatenate([z[:, 1:], z[:, -1:]], axis=1)
    deltas = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) < s - 1,
        z_next - z,
        1e10,
    ) * dnorm

    act = jax.nn.softplus(sigma) if softplus else jnp.maximum(sigma, 0.0)
    alphas = 1.0 - jnp.exp(-deltas * act)
    # transmittance T_i = prod_{j<i} (1 - a_j + 1e-10). Mosaic lowers
    # neither cumprod nor cumsum, so run a Hillis-Steele prefix sum over
    # log(terms) by hand: log2(S) shifted adds, all VMEM-resident. Terms
    # are >= 1e-10 by construction, so the log never produces -inf and
    # the exp underflows gracefully to 0 for fully-absorbed suffixes.
    logt = jnp.log(1.0 - alphas + 1e-10)
    acc = logt
    offset = 1
    while offset < s:
        shifted = jnp.concatenate(
            [jnp.zeros_like(acc[:, :offset]), acc[:, :-offset]], axis=1
        )
        acc = acc + shifted
        offset *= 2
    inclusive = jnp.exp(acc)
    trans = jnp.concatenate([jnp.ones_like(inclusive[:, :1]), inclusive[:, :-1]], axis=1)
    weights = alphas * trans

    opacity = jnp.sum(weights, axis=1, keepdims=True)
    depth = jnp.sum(weights * z, axis=1, keepdims=True) + (1.0 - opacity) * far
    var = jnp.sum(weights * (depth - z) ** 2, axis=1, keepdims=True)

    depth_ref[:] = depth
    opacity_ref[:] = opacity
    var_ref[:] = var
    weights_ref[:] = weights


@functools.partial(jax.jit, static_argnames=("interpret", "softplus"))
def composite_rays(
    z_vals: jax.Array,   # (B, S)
    sigmas: jax.Array,   # (B, S) raw (pre-activation)
    far: jax.Array,      # (B,)
    rays_d_norm: jax.Array,  # (B,) |direction|
    interpret: bool = False,
    softplus: bool = False,
):
    """Fused compositing. Returns (depth (B,), opacity (B,), variance (B,),
    weights (B, S)). Matches raw2outputs(..., sigma_only=True, far=...,
    ret_var=True) without sigma noise (inference path). ``softplus``
    selects the fourier-flagship density activation (relu otherwise)."""
    b, s = z_vals.shape
    assert b % TILE_B == 0, f"ray count {b} must be a multiple of {TILE_B}"
    grid = (b // TILE_B,)

    def row_spec():
        return pl.BlockSpec((TILE_B, s), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def scalar_spec():
        return pl.BlockSpec((TILE_B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)

    depth, opacity, var, weights = pl.pallas_call(
        functools.partial(_composite_kernel, softplus=softplus),
        grid=grid,
        in_specs=[row_spec(), row_spec(), scalar_spec(), scalar_spec()],
        out_specs=(scalar_spec(), scalar_spec(), scalar_spec(), row_spec()),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, s), jnp.float32),
        ),
        interpret=interpret,
    )(z_vals, sigmas, far[:, None], rays_d_norm[:, None])
    return depth[:, 0], opacity[:, 0], var[:, 0], weights
