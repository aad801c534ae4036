"""The LONER mapping loss: depth MSE + line-of-sight loss (JS dynamic
margin or decayed-epsilon LOS) + opacity regularizer.

TPU-native counterpart of ``Optimizer.compute_loss``
(reference src/mapping/optimizer.py:437-595). Differences are purely
structural: a pure function over fixed-shape masked batches (invalid rays
are weighted out rather than filtered), with explicit PRNG keys for the
sampling noise. Loss math matches term for term:

  * opaque rays: measured depth in (0, far]; transparent (sky) rays have
    depth > far and contribute only the pull-weights-to-zero LOS term
  * JS modes: per-ray dynamic margin
      eps_dyn = eps_min * (1 + alpha * clamp(JS, [min_js -> 0, max_js]))
    where JS compares N(depth_gt, eps_min/3) against the rendered weight
    distribution's moments (optimizer.py:476-506)
  * LOS modes: global margin eps decayed per iteration
    (optimizer.py:516-525)
  * depth loss: MSE over opaque rays, in meters (optimizer.py:486-491)
  * LOS loss: L1 or L2 between predicted and target weights x los_lambda
  * opacity loss: mean |opacity - 1| over opaque rays
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from loner_tpu.models.losses import get_weights_gt, js_divergence_gaussian
from loner_tpu.models.rendering import render_rays


@dataclass(frozen=True)
class LossConfig:
    loss_selection: str = "L1_JS"  # L1_JS, L2_JS, L1_LOS, L2_LOS
    min_js_score: float = 1.0
    max_js_score: float = 10.0
    js_alpha: float = 1.0
    los_lambda: float = 1000.0
    decay_los_lambda: bool = False
    min_los_lambda: float = 10.0
    los_lambda_decay_rate: float = 0.001
    los_lambda_decay_steps: float = 15000.0
    depth_eps: float = 3.0
    decay_depth_eps: bool = True
    min_depth_eps: float = 0.5
    depth_eps_decay_rate: float = 0.95
    depth_eps_decay_steps: float = 1.0
    depthloss_lambda: float = 0.005

    @staticmethod
    def from_settings(loss_cfg: dict) -> "LossConfig":
        js = loss_cfg.get("JS_loss", {})
        return LossConfig(
            loss_selection=loss_cfg.get("loss_selection", "L1_JS"),
            min_js_score=float(js.get("min_js_score", 1.0)),
            max_js_score=float(js.get("max_js_score", 10.0)),
            js_alpha=float(js.get("alpha", 1.0)),
            los_lambda=float(loss_cfg.get("los_lambda", 1000.0)),
            decay_los_lambda=bool(loss_cfg.get("decay_los_lambda", False)),
            min_los_lambda=float(loss_cfg.get("min_los_lambda", 10.0)),
            los_lambda_decay_rate=float(loss_cfg.get("los_lambda_decay_rate", 0.001)),
            los_lambda_decay_steps=float(loss_cfg.get("los_lambda_decay_steps", 15000.0)),
            depth_eps=float(loss_cfg.get("depth_eps", 3.0)),
            decay_depth_eps=bool(loss_cfg.get("decay_depth_eps", True)),
            min_depth_eps=float(loss_cfg.get("min_depth_eps", 0.5)),
            depth_eps_decay_rate=float(loss_cfg.get("depth_eps_decay_rate", 0.95)),
            depth_eps_decay_steps=float(loss_cfg.get("depth_eps_decay_steps", 1.0)),
            depthloss_lambda=float(loss_cfg.get("depthloss_lambda", 0.005)),
        )


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    mask = mask.astype(x.dtype)
    return (x * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def compute_camera_loss(
    key: Optional[jax.Array],
    rays: jax.Array,  # (B, 11) camera rays, cube coords
    intensities: jax.Array,  # (B, C) sampled pixel values
    valid: jax.Array,  # (B,) bool
    field_params,
    field_cfg,
    sampler,
    occ_grid,
    n_samples: int,
    perturb: float,
    encode_fn=None,
    point_chunk: int = 131072,
    remat_blocks: bool = True,
    detach_sigma: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Camera-sample supervision for the intensity head: render the
    sampled pixel rays and take the masked MSE against the image pixels.
    With ``detach_sigma`` (the reference's ``detach_rgb_from_sigma``
    knob; sigma-under-no_grad, nerf_tcnn.py:66-69) density is
    stop_gradient'ed — color-only training. False (the shipped default)
    lets camera gradients shape the density field too.

    The reference scaffolds this branch but never enables it
    (build_camera_rays, keyframe.py:103-127; should_enable_camera
    hardwired False, optimizer.py:433). Returns (mse, rendered_rgb)."""
    result = render_rays(
        key,
        rays,
        field_params,
        field_cfg,
        sampler,
        n_samples=n_samples,
        perturb=perturb,
        raw_noise_std=0.0,
        sigma_only=False,
        detach_sigma=detach_sigma,
        occ_grid=occ_grid,
        encode_fn=encode_fn,
        point_chunk=point_chunk,
        remat_blocks=remat_blocks,
    )
    rgb = result["rgb"]
    err = (rgb - intensities) ** 2
    mse = _masked_mean(err, jnp.broadcast_to(valid[:, None], err.shape))
    return mse, rgb


def compute_lidar_loss(
    key: Optional[jax.Array],
    rays: jax.Array,  # (B, 11), cube coords
    depths_cube: jax.Array,  # (B,)
    valid: jax.Array,  # (B,) bool
    field_params,
    field_cfg,
    sampler,
    occ_grid: Optional[jax.Array],
    cfg: LossConfig,
    world_scale: jax.Array,
    n_samples: int,
    perturb: float,
    raw_noise_std: float,
    iteration_idx: jax.Array,
    global_step: jax.Array,
    encode_fn=None,
    point_chunk: int = 131072,
    remat_blocks: bool = True,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Render the batch and assemble the total loss. Returns (loss, aux)
    where aux carries what the occupancy-grid update and logging need."""
    far = rays[:, 10]
    depths_gt_m = depths_cube * world_scale  # meters

    transparent = depths_cube > far
    opaque = (depths_cube > 0) & (~transparent) & valid

    result = render_rays(
        key,
        rays,
        field_params,
        field_cfg,
        sampler,
        n_samples=n_samples,
        perturb=perturb,
        raw_noise_std=raw_noise_std,
        sigma_only=True,
        occ_grid=occ_grid,
        encode_fn=encode_fn,
        point_chunk=point_chunk,
        remat_blocks=remat_blocks,
    )

    z_m = result["z_vals"] * world_scale  # (B, S) meters
    w_pred = result["weights"]  # (B, S)

    # Rendered weight-distribution moments -> JS score per ray
    # (optimizer.py:476-482).
    w_sum = w_pred.sum(axis=1)
    mean = (z_m * w_pred).sum(axis=1) / (w_sum + 1e-10)
    var = ((z_m - mean[:, None]) ** 2 * w_pred).sum(axis=1) / (w_sum + 1e-10) + 1e-10
    std = jnp.sqrt(var)
    eps_min = cfg.min_depth_eps
    js_score = js_divergence_gaussian(depths_gt_m, eps_min / 3.0, mean, std)

    # Depth MSE over opaque rays, in meters (optimizer.py:486-491).
    depth_pred_m = result["depth"] * world_scale
    depth_loss = _masked_mean((depth_pred_m - depths_gt_m) ** 2, opaque)

    sel = cfg.loss_selection
    if sel in ("L1_JS", "L2_JS"):
        js_c = jnp.where(js_score < cfg.min_js_score, 0.0, js_score)
        js_c = jnp.minimum(js_c, cfg.max_js_score)
        eps_dyn = eps_min * (1.0 + cfg.js_alpha * js_c)
        eps_dyn = jax.lax.stop_gradient(eps_dyn)[:, None]  # (B, 1)
        per_ray_eps = eps_dyn[:, 0]
        depth_eps = eps_dyn.mean()
        weights_gt = get_weights_gt(z_m, depths_gt_m[:, None], eps=eps_dyn)
    elif sel in ("L1_LOS", "L2_LOS"):
        if cfg.decay_depth_eps:
            depth_eps = jnp.maximum(
                cfg.depth_eps
                * cfg.depth_eps_decay_rate
                ** (iteration_idx / cfg.depth_eps_decay_steps),
                cfg.min_depth_eps,
            )
        else:
            depth_eps = jnp.asarray(cfg.depth_eps)
        per_ray_eps = jnp.broadcast_to(depth_eps, depths_gt_m.shape)
        weights_gt = get_weights_gt(z_m, depths_gt_m[:, None], eps=depth_eps)
    else:
        raise ValueError(f"Unknown loss selection {sel}")

    # Transparent + invalid rays get all-zero target weights — the LOS term
    # pushes their predicted weights to zero (sky supervision,
    # optimizer.py:506,525).
    weights_gt = jnp.where(opaque[:, None], weights_gt, 0.0)

    if cfg.decay_los_lambda:
        los_lambda = jnp.maximum(
            cfg.los_lambda
            * cfg.los_lambda_decay_rate
            ** ((global_step + 1.0) / cfg.los_lambda_decay_steps),
            cfg.min_los_lambda,
        )
    else:
        los_lambda = jnp.asarray(cfg.los_lambda)

    diff = w_pred - weights_gt
    per_elem = jnp.abs(diff) if sel.startswith("L1") else diff * diff
    # Reference means over the (valid-filtered) batch; we masked-mean so
    # invalid rays don't dilute.
    los_loss = _masked_mean(per_elem, jnp.broadcast_to(valid[:, None], per_elem.shape))

    opacity_loss = _masked_mean(jnp.abs(result["opacity"] - 1.0), opaque)

    loss = cfg.depthloss_lambda * depth_loss + los_lambda * los_loss + opacity_loss

    aux = {
        "loss": loss,
        "depth_loss": depth_loss,
        "los_loss": los_loss,
        "opacity_loss": opacity_loss,
        "depth_eps": depth_eps,
        "js_score": js_score,
        "std": std,
        "points": result["points"],  # (B, S, 3) cube coords, for occ update
        "z_m": z_m,
        "depths_gt_m": depths_gt_m,
        "opaque": opaque,
        "valid": valid,
        # Per-ray debug record (store_ray / draw_samples / draw_rays_eps
        # flags, reference optimizer.py:314-331,544-566). Entries unused by
        # the step's outputs are dead-code-eliminated by XLA.
        "rays": rays,
        "depths_cube": depths_cube,
        "per_ray_eps": per_ray_eps,
        "w_pred": w_pred,
        "w_gt": weights_gt,
    }
    return loss, aux
