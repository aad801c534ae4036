"""Volume rendering: stratified/importance sampling + alpha compositing.

TPU-native counterpart of the reference's rendering stack
(src/models/rendering_tcnn.py:18-267, src/models/ray_sampling.py:18-92).
Everything here is a pure jittable function with static shapes; randomness
is explicit PRNG keys (replacing torch.rand/randn).

LONER ray format (reference ray_utils.py:313-315): each ray is 11 floats
``[origin(3), dir(3), viewdir(3), near, far]`` — we drop the unused (i, j)
pixel slots from the reference's camera path; RAY_DIM documents the layout.

LAYOUT: per-sample 3D point tensors are kept POINT-MINOR ((3, B*S), not
(B*S, 3)) through the hot sigma path — TPU pads the minor dim to 128
lanes, so (M, 3) arrays waste 42x HBM/bandwidth. (B, S) per-ray tensors
(z values, weights) are naturally aligned since S is a multiple of 128.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

RAY_DIM = 11  # origin 3, dir 3, viewdir 3, near 1, far 1


def pack_rays(origins, dirs, near, far, viewdirs=None):
    """Assemble (N, 11) rays. viewdirs default to -dirs (lidar convention,
    reference ray_utils.py:299)."""
    if viewdirs is None:
        viewdirs = -dirs
    return jnp.concatenate(
        [origins, dirs, viewdirs, near[..., None], far[..., None]], axis=-1
    )


def sample_pdf(
    key: jax.Array,
    bins: jax.Array,
    weights: jax.Array,
    n_importance: int,
    det: bool = False,
    eps: float = 1e-5,
) -> jax.Array:
    """Inverse-CDF importance sampling (reference rendering_tcnn.py:18-67).

    bins: (N_rays, B+1) bin edges; weights: (N_rays, B); returns
    (N_rays, n_importance) samples.
    """
    n_rays, n_bins = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, B+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (n_rays, n_importance))
    else:
        u = jax.random.uniform(key, (n_rays, n_importance), dtype=cdf.dtype)

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n_bins)

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, below, axis=-1)
    bins_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)


def stratified_z_vals(
    key: Optional[jax.Array],
    near: jax.Array,
    far: jax.Array,
    n_samples: int,
    perturb: float,
) -> jax.Array:
    """Uniform near->far z values with optional jitter
    (reference ray_sampling.py:22-43). near/far: (N, 1)."""
    n_rays = near.shape[0]
    steps = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    z = near * (1.0 - steps) + far * steps  # (N, S)
    if perturb > 0 and key is not None:
        mid = 0.5 * (z[:, :-1] + z[:, 1:])
        upper = jnp.concatenate([mid, z[:, -1:]], axis=-1)
        lower = jnp.concatenate([z[:, :1], mid], axis=-1)
        rand = perturb * jax.random.uniform(key, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * rand
    return z


def points_along_rays_t(rays_o: jax.Array, rays_d: jax.Array, z_vals: jax.Array) -> jax.Array:
    """(B, 3) origins/dirs + (B, S) z -> point-minor samples (3, B, S)."""
    return rays_o.T[:, :, None] + rays_d.T[:, :, None] * z_vals[None, :, :]


def raw2outputs(
    raw: jax.Array,
    z_vals: jax.Array,
    rays_d: jax.Array,
    key: Optional[jax.Array] = None,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    sigma_only: bool = False,
    num_colors: int = 3,
    softplus: bool = False,
    far: Optional[jax.Array] = None,
    ret_var: bool = False,
) -> Dict[str, jax.Array]:
    """Alpha compositing (reference rendering_tcnn.py:71-147).

    raw: (N, S, 1 or C+1); z_vals: (N, S); rays_d: (N, 3); far: (N, 1).
    Depth uses the far-appended residual bin:
        depth = sum(w_i z_i) + (1 - sum w) * far.
    """
    if sigma_only:
        sigmas = raw[..., 0]
    else:
        rgbs = raw[..., :num_colors]
        sigmas = raw[..., num_colors]

    deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[:, :1], 1e10)], axis=-1
    )
    deltas = deltas * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    if raw_noise_std > 0 and key is not None:
        sigmas = sigmas + jax.random.normal(key, sigmas.shape, sigmas.dtype) * raw_noise_std

    act = jax.nn.softplus if softplus else jax.nn.relu
    alphas = 1.0 - jnp.exp(-deltas * act(sigmas))
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1),
        axis=-1,
    )[:, :-1]
    weights = alphas * trans  # (N, S)
    opacity = jnp.sum(weights, axis=-1)

    if far is not None:
        z_app = jnp.concatenate([z_vals, far], axis=-1)
        w_app = jnp.concatenate(
            [weights, 1.0 - weights.sum(axis=-1, keepdims=True)], axis=-1
        )
        depth = jnp.sum(w_app * z_app, axis=-1)
    else:
        depth = jnp.sum(weights * z_vals, axis=-1)

    out = {"depth": depth, "weights": weights, "opacity": opacity}
    if not sigma_only:
        rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
        if white_bkgd:
            rgb = rgb + (1.0 - opacity[..., None])
        out["rgb"] = rgb
    if ret_var:
        out["variance"] = jnp.sum(weights * (depth[:, None] - z_vals) ** 2, axis=-1)
    return out


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------

class UniformRaySampler:
    """Stratified-uniform z sampling (reference ray_sampling.py:18-43)."""

    def get_samples(self, key, rays, n_samples, perturb, occ_grid=None):
        near, far = rays[:, 9:10], rays[:, 10:11]
        return stratified_z_vals(key, near, far, n_samples, perturb)


class OccGridRaySampler:
    """Half uniform + half occupancy-importance samples, merged and sorted
    (reference ray_sampling.py:46-92). The occupancy grid logits are passed
    per call (pure function; no stored state inside jit)."""

    def get_samples(self, key, rays, n_samples, perturb, occ_grid=None):
        from loner_tpu.models.occupancy_grid import interpolate_occ_logits_t

        if occ_grid is None:
            return UniformRaySampler().get_samples(key, rays, n_samples, perturb)

        k_uniform, k_pdf = (None, None) if key is None else jax.random.split(key)
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        near, far = rays[:, 9:10], rays[:, 10:11]
        n_half = n_samples // 2
        z_vals = stratified_z_vals(k_uniform, near, far, n_half, perturb)

        pts_t = points_along_rays_t(rays_o, rays_d, z_vals)  # (3, B, S/2)
        logits = interpolate_occ_logits_t(occ_grid, pts_t.reshape(3, -1)).reshape(
            z_vals.shape
        )
        probs = jax.nn.sigmoid(logits)
        probs = 2.0 * (jnp.clip(probs, 0.5, 1.0) - 0.5)

        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_imp = sample_pdf(
            k_pdf, z_mid, probs[:, 1:-1], n_half, det=(key is None)
        )
        z_imp = jax.lax.stop_gradient(z_imp)
        return jnp.sort(jnp.concatenate([z_vals, z_imp], axis=-1), axis=-1)


def render_rays(
    key: Optional[jax.Array],
    rays: jax.Array,
    field_params,
    field_cfg,
    sampler,
    n_samples: int,
    perturb: float = 0.0,
    raw_noise_std: float = 0.0,
    white_bkgd: bool = False,
    sigma_only: bool = True,
    detach_sigma: bool = True,
    occ_grid: Optional[jax.Array] = None,
    ret_var: bool = False,
    encode_fn=None,
    point_chunk: int = 131072,
) -> Dict[str, jax.Array]:
    """Render a batch of rays (reference rendering_tcnn.py:192-267).

    rays: (N, 11). Returns dict with depth/weights/opacity/z_vals and the
    sample positions: ``points_t`` (3, N*S) point-minor in the sigma path
    (fed to the occupancy update), ``points`` (N, S, 3) otherwise.

    Field evaluation is blocked over ``point_chunk`` samples via lax.map +
    jax.checkpoint (the TPU-native netchunk, reference model_tcnn.py:82-99)
    to bound the live set of (L*8, block) encoding intermediates.
    """
    from loner_tpu.models.field import query_field, query_sigma_t

    k_sample, k_noise = (None, None) if key is None else jax.random.split(key)

    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    viewdirs = rays[:, 6:9]
    far = rays[:, 10:11]

    z_vals = sampler.get_samples(k_sample, rays, n_samples, perturb, occ_grid)
    n_rays, s = z_vals.shape
    n_pts = n_rays * s

    block = point_chunk if point_chunk else n_pts
    use_blocks = n_pts > block and n_pts % block == 0

    out_extra = {}
    if sigma_only:
        pts_t = points_along_rays_t(rays_o, rays_d, z_vals).reshape(3, n_pts)

        def eval_t(p_t):
            return query_sigma_t(field_params, p_t, field_cfg, encode_fn=encode_fn)

        if use_blocks:
            blocks = pts_t.reshape(3, -1, block).transpose(1, 0, 2)  # (nb, 3, blk)
            sigma = jax.lax.map(jax.checkpoint(eval_t), blocks).reshape(n_pts)
        else:
            sigma = eval_t(pts_t)
        raw = sigma.reshape(n_rays, s, 1)
        out_extra["points_t"] = pts_t
    else:
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        flat_pts = pts.reshape(-1, 3)
        flat_dirs = jnp.repeat(viewdirs, s, axis=0)

        def eval_pts_dirs(pd):
            p, d = pd
            return query_field(
                field_params, p, d, field_cfg,
                sigma_only=False, detach_sigma=detach_sigma, encode_fn=encode_fn,
            )

        if use_blocks:
            raw = jax.lax.map(
                jax.checkpoint(eval_pts_dirs),
                (flat_pts.reshape(-1, block, 3), flat_dirs.reshape(-1, block, 3)),
            ).reshape(n_pts, -1)
        else:
            raw = eval_pts_dirs((flat_pts, flat_dirs))
        raw = raw.reshape(n_rays, s, -1)
        out_extra["points"] = pts

    out = raw2outputs(
        raw,
        z_vals,
        rays_d,
        key=k_noise,
        raw_noise_std=raw_noise_std,
        white_bkgd=white_bkgd,
        sigma_only=sigma_only,
        num_colors=field_cfg.num_colors,
        far=far,
        ret_var=ret_var,
    )
    out["z_vals"] = z_vals
    out.update(out_extra)
    return out
