"""Windowed joint pose+map optimization — the mapping hot loop.

TPU-native counterpart of the reference Optimizer
(src/mapping/optimizer.py:62-626). One optimization iteration is ONE
jitted program with donated (in-place HBM) state, doing fully on device:

  ray-index sampling from HBM-resident keyframe buffers
  -> differentiable ray building from pose twists
  -> occupancy-grid importance sampling
  -> hash-field query + alpha compositing
  -> JS dynamic-margin loss
  -> grad + masked multi-LR Adam update (+ periodic occ-grid SGD step)

versus the reference's per-iteration Python loop with CPU ray building and
host->device copies every step (optimizer.py:276-391). The host loop only
enqueues steps (XLA async dispatch pipelines them); no value is fetched
until the phase ends. Freeze flags become gradient masks instead of
``requires_grad`` flips; a fresh Adam state per phase matches the
reference's per-phase ``torch.optim.Adam`` construction
(optimizer.py:257-267). The keyframe schedule, pose-refinement skipping,
anchoring, and latest-kf-only semantics are preserved.
"""
from __future__ import annotations

import time
from contextlib import nullcontext as _nullcontext
from dataclasses import dataclass, field as dc_field, replace
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from loner_tpu.mapping.loss import LossConfig, compute_camera_loss, compute_lidar_loss
from loner_tpu.mapping.rays import (
    CameraWindowBuffers,
    DeviceScanPool,
    WindowBuffers,
    build_camera_window_buffers,
    build_window_buffers,
    sample_and_build_camera_rays,
    sample_and_build_rays,
)
from loner_tpu.models.field import FieldConfig, init_field_params
from loner_tpu.models.occupancy_grid import init_occ_grid, occ_grid_update
from loner_tpu.models.losses import get_logits_grad
from loner_tpu.models.proposal import (
    ProposalConfig,
    init_proposal_params,
    proposal_logits,
)
from loner_tpu.models.rendering import (
    OccGridRaySampler,
    ProposalRaySampler,
    UniformRaySampler,
)


@dataclass(frozen=True)
class PhaseSettings:
    """One entry of an iteration schedule (cfg/defaults.yaml:76-97)."""

    num_iterations: int = 1
    freeze_poses: bool = False
    latest_kf_only: bool = False
    freeze_sigma_mlp: bool = False
    freeze_rgb_mlp: bool = True

    @staticmethod
    def from_dict(d: dict) -> "PhaseSettings":
        return PhaseSettings(
            num_iterations=int(d.get("num_iterations", 1)),
            freeze_poses=bool(d.get("freeze_poses", False)),
            latest_kf_only=bool(d.get("latest_kf_only", False)),
            freeze_sigma_mlp=bool(d.get("freeze_sigma_mlp", False)),
            freeze_rgb_mlp=bool(d.get("freeze_rgb_mlp", True)),
        )


@dataclass(frozen=True)
class OptimizerConfig:
    """Hyper-parameters of the mapping optimization (static under jit)."""

    n_lidar_samples: int = 512
    n_sky_samples: int = 64
    # Camera pixels sampled per keyframe per iteration when a phase
    # trains the intensity head (freeze_rgb_mlp: False). 0 disables the
    # camera branch entirely (lidar-only flagship). The reference
    # scaffolds but never enables this path (should_enable_camera
    # hardwired False, optimizer.py:433; freeze_rgb_head(True) at :234).
    n_camera_samples: int = 0
    cameraloss_lambda: float = 1.0
    # Camera-branch gradient detach knobs (reference keyframe.py:117-119
    # pose detach; nerf_tcnn.py:66-69 sigma-under-no_grad). With
    # detach_rgb_from_sigma False (the shipped default), camera MSE
    # gradients also flow into the sigma field; pose gradients from
    # camera rays stay off by default (detach_rgb_from_poses True).
    detach_rgb_from_poses: bool = True
    detach_rgb_from_sigma: bool = False
    n_samples_per_ray: int = 512
    perturb: float = 1.0
    raw_noise_std: float = 1.0
    lr_sigma: float = 0.01
    lr_pose: float = 0.001
    lr_rgb: float = 0.01
    lr_gamma: float = 1.0
    # OGM = reference-parity occupancy voxel grid; PROPOSAL = TPU-native
    # proposal-MLP occupancy field (models/proposal.py); UNIFORM = none.
    samples_strategy: str = "OGM"
    rays_strategy: str = "RANDOM"  # or FIXED
    occ_voxel_size: int = 100
    occ_lr: float = 1e-4
    occ_update_every: int = 10
    prop_lr: float = 1e-3  # proposal-MLP Adam rate (PROPOSAL strategy)
    # Occupancy control points per ray for the PROPOSAL sampler (0 = half
    # the sample count, the grid-path default). The smooth MLP field needs
    # very few: the flagship uses 33 (32 lane-aligned bins) — quality
    # parity with 65/129 at a fraction of the interval-lookup cost
    # (docs/PERFORMANCE.md).
    prop_n_ctrl: int = 0
    # Stride over per-ray sample points for the proposal training term
    # (1 = every point, 4 = every 4th). The margin targets are piecewise
    # constant along the ray, so a strided subset carries the same
    # training signal at 1/stride the eval cost.
    prop_train_subsample: int = 4
    proposal: ProposalConfig = dc_field(default_factory=ProposalConfig)
    ray_range: Tuple[float, float] = (1.0, 10.0)
    window_size: int = 8
    enable_sky: bool = False
    point_chunk: int = 131072  # 0 = evaluate all samples in one block
    # Hash-encode implementation for training: "vjp_bf16" (custom-VJP
    # encode, bf16 gather/residuals — the fast path), "vjp_f32" (custom
    # VJP, full precision), or "xla" (autodiff of the gather oracle).
    encode_impl: str = "vjp_bf16"
    # Iterations fused into one dispatched program via lax.scan. >1 cuts
    # per-dispatch host/tunnel overhead by k; the remainder of a phase
    # runs on a single-step program.
    steps_per_dispatch: int = 10
    # Max mapping dispatches in flight on the device queue. Unbounded
    # enqueue (0) keeps the chip saturated but makes a concurrently
    # dispatched tracker ICP wait behind the WHOLE phase backlog (10
    # chunks x ~145 ms at flagship scale = 1.5 s track-latency spikes);
    # 2 = classic double buffering — the device never starves (the next
    # chunk is queued while one runs) and a tracking program dispatched
    # mid-phase waits at most ~2 chunks. No reference analog (its
    # tracker/mapper own separate devices' queues).
    max_inflight_dispatches: int = 2
    # Block rematerialization for the point-eval path: "on" (default) or
    # "off". On-chip A/B at flagship scale (8x512x512, 256x2 fourier,
    # point_chunk=0) measured the two identical (33.5 vs 33.6 ms/it) —
    # XLA's scheduling hides the recompute — so "on" stays default for
    # its lower HBM watermark. Hash custom-VJP encodes force remat off
    # regardless (their residuals are compact by construction).
    remat: str = "on"
    loss: LossConfig = LossConfig()

    @staticmethod
    def from_settings(opt_settings, model_cfg) -> "OptimizerConfig":
        """From reference-format settings (mapper.optimizer + model_config)."""
        render = model_cfg.model.render
        occ = model_cfg.model.occ_model
        train = model_cfg.train
        occ_d = dict(occ)
        rays_strategy = str(opt_settings.rays_selection.strategy)
        if rays_strategy not in ("RANDOM", "MASK", "FIXED"):
            # Reference raises on unknown strategies (optimizer.py:295-297).
            raise RuntimeError(
                f"Can't find rays_selection strategy: {rays_strategy}"
            )
        return OptimizerConfig(
            n_lidar_samples=int(opt_settings.num_samples.lidar),
            n_sky_samples=int(opt_settings.num_samples.sky),
            n_camera_samples=int(dict(opt_settings.num_samples).get("camera", 0)),
            cameraloss_lambda=float(
                dict(model_cfg.loss).get("cameraloss_lambda", 1.0)
            ),
            detach_rgb_from_poses=bool(
                dict(opt_settings).get("detach_rgb_from_poses", True)
            ),
            detach_rgb_from_sigma=bool(
                dict(opt_settings).get("detach_rgb_from_sigma", False)
            ),
            n_samples_per_ray=int(render.N_samples_train),
            perturb=float(render.perturb),
            raw_noise_std=float(render.raw_noise_std),
            lr_sigma=float(train.lrate_sigma_mlp),
            lr_pose=float(train.lrate_pose),
            lr_rgb=float(dict(train).get("lrate_rgb", 0.01)),
            lr_gamma=float(train.lrate_gamma),
            samples_strategy=str(opt_settings.samples_selection.strategy),
            rays_strategy=rays_strategy,
            occ_voxel_size=int(occ.voxel_size),
            occ_lr=float(occ.lr),
            occ_update_every=int(occ.N_iters_acc),
            prop_lr=float(occ_d.get("prop_lr", 1e-3)),
            prop_n_ctrl=int(occ_d.get("prop_n_ctrl", 0)),
            prop_train_subsample=int(occ_d.get("prop_train_subsample", 4)),
            proposal=ProposalConfig.from_settings(occ_d.get("proposal", {})),
            ray_range=tuple(float(x) for x in model_cfg.model.ray_range),
            encode_impl=str(dict(train).get("encode_impl", "vjp_bf16")),
            steps_per_dispatch=int(dict(train).get("steps_per_dispatch", 10)),
            max_inflight_dispatches=int(
                dict(train).get("max_inflight_dispatches", 2)
            ),
            point_chunk=int(dict(train).get("point_chunk", 131072)),
            remat=str(dict(train).get("remat", "on")),
            loss=LossConfig.from_settings(model_cfg.loss),
        )


@dataclass
class MapState:
    """All device-resident optimizer state (a pytree of arrays)."""

    field_params: Dict[str, Any]
    occ_grid: Optional[jax.Array]
    global_step: int = 0


def _adam_with_schedule(lr: float, gamma: float) -> optax.GradientTransformation:
    if gamma == 1.0:
        return optax.adam(lr)
    return optax.adam(lambda step: lr * gamma ** step)


def fused_steps(cfg: "OptimizerConfig", extras_mode: str) -> int:
    """Iterations fused per dispatched program. Shared by the phase
    runner and warm_up — both must agree on which programs exist."""
    if extras_mode == "full":
        return 1
    return max(int(cfg.steps_per_dispatch), 1)


def make_phase_runner(
    cfg: OptimizerConfig,
    field_cfg: FieldConfig,
    phase: PhaseSettings,
    window_size: int,
    point_pad: int,
    sky_pad: int,
    encode_fn=None,
    extras_mode: str = "none",
    has_camera: bool = True,
):
    """Build the runner for an optimization phase: a jitted single
    ITERATION (sample -> build rays -> render -> loss -> masked multi-LR
    Adam -> periodic occ update) plus a host dispatch loop.

    One iteration per dispatch rather than a lax.scan over the whole
    phase: the scan variant compiles a program the TPU toolchain chokes on
    at full scale, while the single-step program compiles in ~1 min and is
    SHARED between the 50-iter and 1000-iter phases (num_iterations is not
    baked in). XLA's async dispatch keeps the device saturated — the host
    enqueues the next step while the previous executes; nothing is fetched
    until the phase ends.

    Static: hyperparameters, freeze flags, buffer shapes. Donated: params,
    optimizer state, occupancy grid (in-place HBM updates).
    """
    assert extras_mode in ("none", "ray", "full")
    use_occ = cfg.samples_strategy == "OGM"
    use_prop = cfg.samples_strategy == "PROPOSAL"
    if use_occ:
        sampler = OccGridRaySampler()
    elif use_prop:
        sampler = ProposalRaySampler(n_ctrl=cfg.prop_n_ctrl or None)
    else:
        sampler = UniformRaySampler()
    n_sky = cfg.n_sky_samples if cfg.enable_sky else 0
    optimize_poses = not phase.freeze_poses
    optimize_sigma = not phase.freeze_sigma_mlp
    # Intensity-head training: when a phase unfreezes the RGB/intensity
    # MLP, its params join opt_params under their own Adam transform and
    # (if camera samples are configured) the camera-sample MSE branch
    # supervises them. The reference parses freeze_rgb_mlp but hardwires
    # the head frozen (optimizer.py:234 freeze_rgb_head(True)).
    optimize_rgb = not phase.freeze_rgb_mlp
    # has_camera: a camera-enabled schedule on a lidar-only run (no
    # camera geometry) must not trace the camera branch — it would
    # dereference cam_buffers=None inside the jitted loss.
    use_camera = optimize_rgb and cfg.n_camera_samples > 0 and has_camera

    # Training encode path. The custom-VJP encode saves gathered corner
    # features instead of rematerializing them, so the per-block
    # jax.checkpoint must be OFF for it (it would discard the residuals
    # and re-gather, defeating the point). Fourier configs choose by
    # cfg.remat (measured a wash at flagship scale; see OptimizerConfig).
    if cfg.remat in ("on", "off"):
        remat_blocks = cfg.remat == "on"
    else:
        raise RuntimeError(
            f"Unrecognized remat mode '{cfg.remat}' (expected on, off)"
        )
    uses_hash_sigma = field_cfg.encoding_sigma != "fourier"
    if cfg.encode_impl not in ("xla", "vjp_bf16", "vjp_f32"):
        raise RuntimeError(
            f"Unrecognized encode_impl '{cfg.encode_impl}' "
            "(expected xla, vjp_bf16, or vjp_f32)"
        )
    if encode_fn is None and cfg.encode_impl != "xla" and uses_hash_sigma:
        from loner_tpu.models.hash_encoding import hash_encode_train

        dt = jnp.bfloat16 if cfg.encode_impl == "vjp_bf16" else jnp.float32
        encode_fn = hash_encode_train(compute_dtype=dt, residual_dtype=dt)
        remat_blocks = False

    transforms = {
        "sigma": _adam_with_schedule(cfg.lr_sigma, cfg.lr_gamma),
        "twists": _adam_with_schedule(cfg.lr_pose, cfg.lr_gamma),
    }
    if use_prop:
        transforms["proposal"] = optax.adam(cfg.prop_lr)
    if optimize_rgb:
        transforms["rgb"] = _adam_with_schedule(cfg.lr_rgb, cfg.lr_gamma)

    def _labels(tree):
        lab = {
            "sigma": jax.tree.map(lambda _: "sigma", tree["sigma"]),
            "twists": "twists",
        }
        if "proposal" in tree:
            lab["proposal"] = jax.tree.map(lambda _: "proposal", tree["proposal"])
        if "intensity" in tree:
            lab["intensity"] = jax.tree.map(lambda _: "rgb", tree["intensity"])
        return lab

    tx = optax.multi_transform(transforms, param_labels=_labels)

    def loss_fn(opt_params, static_intensity, occ_grid, buffers, cam_buffers,
                world_scale, world_shift, key, it_idx, global_step):
        field_params = {
            "sigma": opt_params["sigma"],
            "intensity": opt_params["intensity"]
            if optimize_rgb
            else static_intensity,
        }
        k_rays, k_cam, k_render = jax.random.split(key, 3)
        rays, depths_cube, valid = sample_and_build_rays(
            k_rays,
            buffers,
            opt_params["twists"],
            world_scale,
            world_shift,
            cfg.ray_range,
            cfg.n_lidar_samples,
            n_sky,
            fixed_indices=(cfg.rays_strategy == "FIXED"),
        )
        if use_occ:
            sampler_state = occ_grid
        elif use_prop:
            sampler_state = opt_params["proposal"]
        else:
            sampler_state = None
        loss, aux = compute_lidar_loss(
            k_render,
            rays,
            depths_cube,
            valid,
            field_params,
            field_cfg,
            sampler,
            sampler_state,
            cfg.loss,
            world_scale,
            cfg.n_samples_per_ray,
            cfg.perturb,
            cfg.raw_noise_std,
            it_idx,
            global_step,
            encode_fn=encode_fn,
            point_chunk=cfg.point_chunk,
            remat_blocks=remat_blocks,
        )
        if use_prop:
            # Proposal-MLP training: the reference pushes point logits
            # toward the +/-1 occupancy margin targets with an explicit
            # gradient (optimizer.py:598-609, losses.py:54-62). The linear
            # loss mean(stop_grad(logits_grad) * logits) reproduces that
            # update direction through autodiff; it is zero-gradient for
            # sigma/twists by construction. Training on a strided subset of
            # the sample points keeps the same signal density over a few
            # iterations at a fraction of the cost (the reference's grid
            # update runs only every N_iters_acc=10 iterations for the
            # same reason).
            sub = max(int(cfg.prop_train_subsample), 1)
            z_sub = aux["z_m"][:, ::sub]
            logits_grad = get_logits_grad(z_sub, aux["depths_gt_m"][:, None])
            logits_grad = logits_grad * aux["valid"][:, None]
            logits = proposal_logits(
                opt_params["proposal"],
                jax.lax.stop_gradient(aux["points"][:, ::sub]),
            )
            # Normalize over VALID rays (not the padded batch) so the
            # effective proposal step size is invariant to how many
            # window slots are empty — a 1-keyframe bootstrap window and
            # a full window train the proposal at the same rate.
            denom = jnp.maximum(
                aux["valid"].sum().astype(logits.dtype) * z_sub.shape[1], 1.0
            )
            prop_loss = (
                jnp.sum(jax.lax.stop_gradient(logits_grad) * logits) / denom
            )
            loss = loss + prop_loss
        if use_camera:
            cam_rays, cam_intens, cam_valid = sample_and_build_camera_rays(
                k_cam,
                cam_buffers,
                opt_params["twists"],
                world_scale,
                world_shift,
                cfg.ray_range,
                cfg.n_camera_samples,
                buffers.slot_valid,
                detach_poses=cfg.detach_rgb_from_poses,
            )
            k_cam_render = jax.random.fold_in(k_render, 1)
            cam_mse, _ = compute_camera_loss(
                k_cam_render,
                cam_rays,
                cam_intens,
                cam_valid,
                field_params,
                field_cfg,
                sampler,
                sampler_state,
                cfg.n_samples_per_ray,
                cfg.perturb,
                encode_fn=encode_fn,
                point_chunk=cfg.point_chunk,
                remat_blocks=remat_blocks,
                detach_sigma=cfg.detach_rgb_from_sigma,
            )
            aux["camera_loss"] = cam_mse
            loss = loss + cfg.cameraloss_lambda * cam_mse
        return loss, aux

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step_core(
        opt_params,
        opt_state,
        occ_grid,
        static_intensity,
        buffers: WindowBuffers,
        cam_buffers,
        pose_mask: jax.Array,
        world_scale: jax.Array,
        world_shift: jax.Array,
        it_idx: jax.Array,
        global_step: jax.Array,
        key: jax.Array,
    ):
        (loss, aux), grads = grad_fn(
            opt_params, static_intensity, occ_grid, buffers, cam_buffers,
            world_scale, world_shift, key, it_idx.astype(jnp.float32),
            global_step.astype(jnp.float32),
        )
        # Freeze semantics as gradient masks (reference toggles
        # requires_grad / builds per-phase param groups instead).
        g_twists = grads["twists"] * pose_mask[:, None]
        if not optimize_poses:
            g_twists = jnp.zeros_like(g_twists)
        g_sigma = grads["sigma"]
        if not optimize_sigma:
            g_sigma = jax.tree.map(jnp.zeros_like, g_sigma)
        masked = {"sigma": g_sigma, "twists": g_twists}
        if "proposal" in grads:
            masked["proposal"] = grads["proposal"]
        if "intensity" in grads:
            masked["intensity"] = grads["intensity"]
        grads = masked

        updates, opt_state = tx.update(grads, opt_state, opt_params)
        opt_params = optax.apply_updates(opt_params, updates)

        if use_occ:
            def do_occ(og):
                logits_grad = get_logits_grad(aux["z_m"], aux["depths_gt_m"][:, None])
                logits_grad = logits_grad * aux["valid"][:, None]
                return occ_grid_update(
                    og, jax.lax.stop_gradient(aux["points"]), logits_grad, cfg.occ_lr
                )

            occ_grid = jax.lax.cond(
                global_step % cfg.occ_update_every == 0, do_occ, lambda og: og, occ_grid
            )

        # Per-iteration ray record for the store_ray / draw_samples /
        # draw_rays_eps debug flags (reference optimizer.py:314-331,
        # 544-566). Unrequested aux entries are DCE'd by XLA.
        extras = {}
        if extras_mode != "none":
            extras = {
                "rays": aux["rays"],
                "depths_cube": aux["depths_cube"],
                "std": aux["std"],
                "js": aux["js_score"],
                "valid": aux["valid"],
            }
        if extras_mode == "full":
            extras.update(
                points=aux["points"],
                w_pred=aux["w_pred"],
                w_gt=aux["w_gt"],
                z_m=aux["z_m"],
                per_ray_eps=aux["per_ray_eps"],
            )

        # Report the mapping loss (aux["loss"]), not the total that may
        # include the proposal-training term.
        return opt_params, opt_state, occ_grid, aux["loss"], aux["depth_eps"], extras

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step(opt_params, opt_state, occ_grid, static_intensity, buffers,
             cam_buffers, pose_mask, world_scale, world_shift, it_idx,
             global_step, key):
        return step_core(
            opt_params, opt_state, occ_grid, static_intensity, buffers,
            cam_buffers, pose_mask, world_scale, world_shift, it_idx,
            global_step, key,
        )

    # k iterations fused into ONE dispatched program: the per-dispatch
    # host/tunnel cost (argument marshalling across the device transport)
    # is paid once per k steps instead of every step. The scan body is
    # compiled once, so compile time matches the single-step program.
    # The heavy per-iteration debug record forces single-step dispatch
    # (its stacked extras would not fit host memory comfortably).
    k_fused = fused_steps(cfg, extras_mode)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def multi_step(opt_params, opt_state, occ_grid, static_intensity, buffers,
                   cam_buffers, pose_mask, world_scale, world_shift, it0, gs0,
                   key):
        def body(carry, i):
            p, s, og = carry
            sub = jax.random.fold_in(key, i)
            p, s, og, loss, eps, extras = step_core(
                p, s, og, static_intensity, buffers, cam_buffers, pose_mask,
                world_scale, world_shift, it0 + i, gs0 + i, sub,
            )
            return (p, s, og), (loss, eps, extras)

        (opt_params, opt_state, occ_grid), (losses, epss, extras) = jax.lax.scan(
            body, (opt_params, opt_state, occ_grid),
            jnp.arange(k_fused, dtype=jnp.int32),
        )
        return opt_params, opt_state, occ_grid, losses, epss, extras

    def run_phase(
        field_params: Dict[str, Any],
        occ_grid: jax.Array,
        twists: jax.Array,  # (W, 6)
        buffers: WindowBuffers,
        pose_mask: jax.Array,  # (W,) 1.0 where the pose may move
        world_scale: jax.Array,
        world_shift: jax.Array,
        global_step0,
        key: jax.Array,
        num_iterations: int = None,
        extras_log: Optional[list] = None,
        cam_buffers: Optional[CameraWindowBuffers] = None,
    ):
        n_iters = phase.num_iterations if num_iterations is None else num_iterations
        opt_params = {"sigma": field_params["sigma"], "twists": twists}
        if use_prop:
            # The proposal pytree travels in the occupancy slot between
            # phases/checkpoints but is a trained parameter inside one.
            opt_params["proposal"] = occ_grid
            occ_grid = None
        if optimize_rgb:
            opt_params["intensity"] = field_params["intensity"]
            static_intensity = None  # empty pytree; loss_fn ignores it
        else:
            static_intensity = field_params["intensity"]
        opt_state = tx.init(opt_params)
        step0 = int(global_step0)

        def collect(extras, k: int):
            # Fetch the per-iteration debug record host-side; single-step
            # dispatches get a leading length-1 axis to match the scan's
            # stacked (k, ...) layout.
            if extras_log is None or not extras:
                return
            if k == 1:
                rec = {name: np.asarray(v)[None] for name, v in extras.items()}
            else:
                rec = {name: np.asarray(v) for name, v in extras.items()}
            extras_log.append(rec)

        losses, eps_log = [], []
        # Bound the device-queue depth (double buffering): before
        # enqueuing chunk i, wait for chunk i-depth to finish via its
        # (tiny) loss array. Keeps the chip busy while capping how long a
        # concurrently dispatched tracker program can wait behind mapping
        # work (see OptimizerConfig.max_inflight_dispatches).
        inflight_depth = max(int(cfg.max_inflight_dispatches), 0)
        i = 0
        if k_fused > 1:
            n_chunk = 0
            while i + k_fused <= n_iters:
                if inflight_depth and n_chunk >= inflight_depth:
                    jax.block_until_ready(losses[n_chunk - inflight_depth])
                opt_params, opt_state, occ_grid, ls, es, extras = multi_step(
                    opt_params, opt_state, occ_grid, static_intensity, buffers,
                    cam_buffers, pose_mask, world_scale, world_shift,
                    jnp.asarray(i, jnp.int32), jnp.asarray(step0 + i, jnp.int32),
                    jax.random.fold_in(key, i),
                )
                losses.append(ls)
                eps_log.append(es)
                collect(extras, k_fused)
                i += k_fused
                n_chunk += 1
        while i < n_iters:
            opt_params, opt_state, occ_grid, loss, eps, extras = step(
                opt_params, opt_state, occ_grid, static_intensity, buffers,
                cam_buffers, pose_mask, world_scale, world_shift,
                jnp.asarray(i, jnp.int32), jnp.asarray(step0 + i, jnp.int32),
                jax.random.fold_in(jax.random.fold_in(key, i), 1),
            )
            losses.append(loss[None])  # step() returns scalars
            eps_log.append(eps[None])
            collect(extras, 1)
            i += 1

        new_field = {
            "sigma": opt_params["sigma"],
            "intensity": opt_params["intensity"]
            if optimize_rgb
            else static_intensity,
        }
        sampler_state = opt_params["proposal"] if use_prop else occ_grid
        return (
            new_field,
            sampler_state,
            opt_params["twists"],
            jnp.concatenate(losses) if losses else jnp.zeros((0,), jnp.float32),
            jnp.concatenate(eps_log) if eps_log else jnp.zeros((0,), jnp.float32),
        )

    return run_phase


class Optimizer:
    """Host-side driver: keyframe schedule + phase runner cache + state.

    Mirrors the reference Optimizer's public behavior
    (iterate_optimizer over a keyframe window, optimizer.py:144-192) while
    owning the device-resident MapState.
    """

    def __init__(
        self,
        cfg: OptimizerConfig,
        field_cfg: FieldConfig,
        world_scale: float,
        world_shift: np.ndarray,
        keyframe_schedule: List[dict],
        skip_pose_refinement: bool = True,
        use_gt_poses: bool = False,
        freeze_poses: bool = False,
        seed: int = 0,
        encode_fn=None,
        mesh=None,
        camera_rays: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        log_directory: Optional[str] = None,
        profile_optimizer: bool = False,
        verbose_timing: bool = False,
        log_losses: bool = False,
        write_ray_point_clouds: bool = False,
        store_ray: bool = False,
        draw_samples: bool = False,
        draw_rays_eps: bool = False,
    ) -> None:
        self._cfg = cfg
        self._field_cfg = field_cfg
        self._world_scale = jnp.asarray(world_scale, jnp.float32)
        self._world_shift = jnp.asarray(world_shift, jnp.float32)
        self._keyframe_schedule = keyframe_schedule
        self._skip_pose_refinement = skip_pose_refinement
        self._use_gt_poses = use_gt_poses
        self._freeze_poses = freeze_poses
        self._encode_fn = encode_fn
        # Multi-chip mesh (jax.sharding.Mesh): keyframe-window slots and
        # their point buffers shard across devices; field/occ/pose state
        # replicates and GSPMD all-reduces its gradients over ICI
        # (parallel/mesh.py). None = single-device (the reference's only
        # mode — it is single-GPU, SURVEY §2.2).
        self._mesh = mesh
        # Camera-supervision geometry: (cam_dirs (HW, 3) camera-frame
        # pixel ray dirs, lidar_to_camera (4, 4)). None = lidar-only.
        self._camera_rays = camera_rays
        if camera_rays is None and cfg.n_camera_samples > 0:
            print(
                "Warning: num_samples.camera > 0 but no camera geometry "
                "(lidar-only run) — camera-sample supervision is disabled."
            )
        self._log_directory = log_directory
        self._profile_optimizer = profile_optimizer
        self._verbose_timing = verbose_timing
        self._log_losses = log_losses
        self._write_ray_point_clouds = write_ray_point_clouds
        self._store_ray = store_ray
        self._draw_samples = draw_samples
        self._draw_rays_eps = draw_rays_eps
        if draw_samples or draw_rays_eps:
            self._extras_mode = "full"
        elif store_ray:
            self._extras_mode = "ray"
        else:
            self._extras_mode = "none"

        key = jax.random.key(seed)
        k_field, k_prop, self._key = jax.random.split(key, 3)
        if cfg.samples_strategy == "OGM":
            sampler_state = init_occ_grid(cfg.occ_voxel_size)
        elif cfg.samples_strategy == "PROPOSAL":
            sampler_state = init_proposal_params(k_prop, cfg.proposal)
        else:
            sampler_state = jnp.zeros((1, 1, 1), jnp.float32)
        self.state = MapState(
            field_params=init_field_params(k_field, field_cfg),
            occ_grid=sampler_state,
        )
        if self._mesh is not None:
            from loner_tpu.parallel.mesh import replicate

            self.state.field_params = replicate(self.state.field_params, self._mesh)
            self.state.occ_grid = replicate(self.state.occ_grid, self._mesh)
        self._keyframe_count = 0
        self._runner_cache: Dict[tuple, Any] = {}
        self._scan_pool = DeviceScanPool()
        self.last_losses: Optional[np.ndarray] = None
        self.last_depth_eps: Optional[np.ndarray] = None

    def restore(
        self,
        field_params,
        occ_state,
        global_step: int,
        keyframe_count: int,
    ) -> None:
        """Mid-run resume from a full checkpoint (runtime/resume.py).

        Adam state is intentionally NOT restored: it is created per
        schedule phase (matching the reference, which builds a fresh
        torch Adam per phase, src/mapping/optimizer.py:259-267), so the
        checkpointed {params, occ/proposal state, poses, global_step}
        fully determine the continuation."""
        field_params = jax.tree.map(jnp.asarray, field_params)
        if occ_state is not None:
            occ_state = jax.tree.map(jnp.asarray, occ_state)
        if self._mesh is not None:
            from loner_tpu.parallel.mesh import replicate

            field_params = replicate(field_params, self._mesh)
            if occ_state is not None:
                occ_state = replicate(occ_state, self._mesh)
        self.state.field_params = field_params
        if occ_state is not None:
            self.state.occ_grid = occ_state
        self.state.global_step = int(global_step)
        self._keyframe_count = int(keyframe_count)

    # -- schedule ------------------------------------------------------------
    def _select_schedule(self) -> List[PhaseSettings]:
        """Pick the iteration schedule for the current keyframe count
        (reference optimizer.py:146-156)."""
        cumulative = 0
        schedule = self._keyframe_schedule[-1]["iteration_schedule"]
        for item in self._keyframe_schedule:
            cumulative += item["num_keyframes"]
            if cumulative >= self._keyframe_count + 1 or item["num_keyframes"] == -1:
                schedule = item["iteration_schedule"]
                break
        phases = [PhaseSettings.from_dict(p) for p in schedule]
        if len(phases) > 1 and self._skip_pose_refinement:
            phases = phases[1:]  # reference optimizer.py:200-201
        return phases

    def _get_runner(self, phase: PhaseSettings, w: int, p: int, ps: int):
        # num_iterations is NOT part of the compiled step: the 50-iter and
        # 1000-iter phases share one jitted program.
        cache_key = (replace(phase, num_iterations=0), w, p, ps, self._extras_mode)
        if cache_key not in self._runner_cache:
            self._runner_cache[cache_key] = make_phase_runner(
                self._cfg, self._field_cfg, phase, w, p, ps, self._encode_fn,
                extras_mode=self._extras_mode,
                has_camera=self._camera_rays is not None,
            )
        return self._runner_cache[cache_key]

    def _build_camera_buffers(self, window: List["KeyFrame"], w: int):
        """Pack the window keyframes' images (where present) into the
        fixed-shape camera buffers for the intensity-training branch."""
        cam_dirs, lidar_to_camera = self._camera_rays
        images = []
        for i in range(w):
            j = min(i, len(window) - 1)
            img = window[j]._frame.image
            images.append(None if img is None else img.image)
        cam = build_camera_window_buffers(
            images, cam_dirs, lidar_to_camera, w,
            num_colors=self._field_cfg.num_colors,
        )
        if self._mesh is not None:
            from loner_tpu.parallel.mesh import replicate

            cam = replicate(cam, self._mesh)
        return cam

    def _window_classes_for_item(self, first_kf: int, last_kf: Optional[int]):
        """Window size classes a schedule item can run at. KF#k optimizes
        a window of min(k, W) keyframes, so only the item covering KF#1
        ever sees the 1-keyframe (bootstrap) class; everything else runs
        the full width. Meshes pin the full width (the slot axis shards)."""
        w_full = self._cfg.window_size
        classes = set()
        if first_kf == 1:
            classes.add(1 if self._mesh is None else w_full)
        if last_kf is None or last_kf >= 2:
            classes.add(w_full)
        return classes

    def warm_up(self, n_points: int) -> float:
        """Pre-compile every phase runner the keyframe schedule can reach.

        The reference pays its CUDA/autograd warm-up implicitly on the
        first keyframe; under XLA the first dispatch of each distinct
        phase program costs a full compile (~20-60 s on chip), which
        would stall the tracker->mapper pipeline at startup. Calling this
        before streaming moves every compile out of the real-time path.

        ``n_points`` is the per-scan point count; buffers are pow2-padded
        (rays.build_window_buffers), so any count in the same pow2 bucket
        as the real scans hits the same compiled programs. A mismatched
        bucket only wastes a compile — it never breaks correctness.

        Runs each program once on dummy state (the runners donate their
        inputs, so the live MapState is never passed). Returns the
        wall-clock seconds spent.
        """
        t0 = time.time()
        rng = np.random.default_rng(0)
        d = rng.normal(size=(3, max(int(n_points), 1))).astype(np.float32)
        d /= np.linalg.norm(d, axis=0, keepdims=True) + 1e-9
        lo, hi = sorted(self._cfg.ray_range)
        depths = rng.uniform(lo + 0.1, hi - 0.1, d.shape[1]).astype(np.float32)

        buffers_by_w: Dict[int, WindowBuffers] = {}
        cam_by_w: Dict[int, Any] = {}

        def get_buffers(w: int) -> WindowBuffers:
            if w not in buffers_by_w:
                b = build_window_buffers([d], [depths], [None], w)
                if self._mesh is not None:
                    from loner_tpu.parallel.mesh import shard_window_buffers

                    b = shard_window_buffers(b, self._mesh)
                buffers_by_w[w] = b
            return buffers_by_w[w]

        def get_cam(w: int):
            if w not in cam_by_w:
                cam_dirs, l2c = self._camera_rays
                cam = build_camera_window_buffers(
                    [None] * w, cam_dirs, l2c, w,
                    num_colors=self._field_cfg.num_colors,
                )
                if self._mesh is not None:
                    from loner_tpu.parallel.mesh import replicate

                    cam = replicate(cam, self._mesh)
                cam_by_w[w] = cam
            return cam_by_w[w]

        p = get_buffers(self._cfg.window_size).dirs.shape[1]
        ps = get_buffers(self._cfg.window_size).sky_dirs.shape[1]
        k = fused_steps(self._cfg, self._extras_mode)
        if self._cfg.rays_strategy == "MASK":
            print(
                "warm_up: rays_strategy is MASK — the runtime point count "
                "(mask-filtered) may land in a different pow2 bucket than "
                f"the {p}-point warm-up window; pass the filtered count "
                "for a guaranteed cache hit."
            )

        def dummy_state():
            key = jax.random.key(17)
            k_field, k_prop = jax.random.split(key)
            if self._cfg.samples_strategy == "OGM":
                sampler = init_occ_grid(self._cfg.occ_voxel_size)
            elif self._cfg.samples_strategy == "PROPOSAL":
                sampler = init_proposal_params(k_prop, self._cfg.proposal)
            else:
                sampler = jnp.zeros((1, 1, 1), jnp.float32)
            field_params = init_field_params(k_field, self._field_cfg)
            if self._mesh is not None:
                from loner_tpu.parallel.mesh import replicate

                field_params = replicate(field_params, self._mesh)
                sampler = replicate(sampler, self._mesh)
            return field_params, sampler

        # Union the program kinds every reachable (phase x window-class)
        # combination dispatches: two phases can share a cache key but
        # need DIFFERENT programs (one divisible by k -> only the fused
        # scan; another not -> also the single-step remainder), so
        # first-occurrence dedup would leave a compile to land inside the
        # real-time loop.
        needs: Dict[tuple, set] = {}
        eff_phases: Dict[tuple, PhaseSettings] = {}
        first_kf = 1
        for item in self._keyframe_schedule:
            nk = int(item["num_keyframes"])
            last_kf = None if nk == -1 else first_kf + nk - 1
            w_classes = self._window_classes_for_item(first_kf, last_kf)
            first_kf = first_kf if last_kf is None else last_kf + 1
            phases = [
                PhaseSettings.from_dict(ph) for ph in item["iteration_schedule"]
            ]
            if len(phases) > 1 and self._skip_pose_refinement:
                phases = phases[1:]
            for phase in phases:
                freeze = (
                    phase.freeze_poses or self._freeze_poses or self._use_gt_poses
                )
                eff_phase = replace(phase, freeze_poses=freeze)
                for w in w_classes:
                    cache_key = (
                        replace(eff_phase, num_iterations=0), w, p, ps,
                        self._extras_mode,
                    )
                    n = int(phase.num_iterations)
                    kinds = needs.setdefault(cache_key, set())
                    if k > 1 and n >= k:
                        kinds.add("fused")
                    if k == 1 or n % k != 0:
                        kinds.add("single")
                    eff_phases[cache_key] = eff_phase

        mesh_ctx = (
            jax.set_mesh(self._mesh) if self._mesh is not None else _nullcontext()
        )
        with mesh_ctx:
            for cache_key, kinds in needs.items():
                warm_iters = (k if "fused" in kinds else 0) + (
                    1 if "single" in kinds else 0
                )
                eff_phase = eff_phases[cache_key]
                w = cache_key[1]
                use_cam = (
                    not eff_phase.freeze_rgb_mlp
                    and self._cfg.n_camera_samples > 0
                    and self._camera_rays is not None
                )
                field_params, sampler = dummy_state()
                runner = self._get_runner(eff_phase, w, p, ps)
                twists0 = jnp.zeros((w, 6), jnp.float32)
                mask0 = jnp.ones((w,), jnp.float32)
                if self._mesh is not None:
                    from loner_tpu.parallel.mesh import replicate

                    twists0 = replicate(twists0, self._mesh)
                    mask0 = replicate(mask0, self._mesh)
                out = runner(
                    field_params,
                    sampler,
                    twists0,
                    get_buffers(w),
                    mask0,
                    self._world_scale,
                    self._world_shift,
                    0,
                    jax.random.key(3),
                    num_iterations=warm_iters,
                    cam_buffers=get_cam(w) if use_cam else None,
                )
                np.asarray(out[3])  # block until the compiles complete
        return time.time() - t0

    # -- main entry ------------------------------------------------------------
    def iterate_optimizer(self, window: List["KeyFrame"]) -> float:
        """Run the full iteration schedule on a keyframe window.

        The window is a list of mapping.keyframe.KeyFrame; optimized poses
        are written back into the keyframes (twist convention).
        """
        from loner_tpu.runtime.profiling import optimizer_trace

        start_time = time.time()

        if len(window) == 1:
            window[0].is_anchored = True  # reference optimizer.py:197-198

        phases = self._select_schedule()
        num_its = sum(p.num_iterations for p in phases)

        m = len(window)
        # Window size class: a 1-keyframe window (the KF#1 bootstrap, 1000
        # iterations by the reference schedule) runs a W=1 program — the
        # full-window program would spend 7/8 of its compute on masked-out
        # replica slots. Identical math (the loss normalizes over valid
        # rays); ~WINDOW× cheaper bootstrap. Under a mesh the slot axis is
        # the shard axis, so the full width is kept.
        w = 1 if (m == 1 and self._mesh is None) else self._cfg.window_size
        use_mask = self._cfg.rays_strategy == "MASK"
        # Device scan pool: each keyframe's scan uploads once; the window
        # assembles on device (vs re-shipping all 8 slots every KF).
        buffers = self._scan_pool.build_window(window, w, use_mask)
        if self._mesh is not None:
            from loner_tpu.parallel.mesh import shard_window_buffers

            buffers = shard_window_buffers(buffers, self._mesh)
        p = buffers.dirs.shape[1]
        ps = buffers.sky_dirs.shape[1]

        cam_buffers = None
        if (
            self._camera_rays is not None
            and self._cfg.n_camera_samples > 0
            and any(not ph.freeze_rgb_mlp for ph in phases)
        ):
            cam_buffers = self._build_camera_buffers(window, w)
        twists = np.zeros((w, 6), np.float32)
        anchored = np.zeros((w,), np.float32)
        for i in range(w):
            j = min(i, m - 1)
            twists[i] = window[j].pose_twist(self._use_gt_poses)
            anchored[i] = 1.0 if (window[j].is_anchored or i >= m) else 0.0
        twists = jnp.asarray(twists)
        if self._mesh is not None:
            from loner_tpu.parallel.mesh import replicate

            twists = replicate(twists, self._mesh)

        all_losses, all_eps = [], []
        # Streaming sink: per-dispatch debug records are written to disk
        # as they arrive (draw_samples' full sample clouds are ~50 MB per
        # iteration at reference scale — accumulating a 1000-iteration
        # bootstrap keyframe in host RAM is not an option).
        extras_log = None
        if self._extras_mode != "none" and self._log_directory is not None:
            from loner_tpu.runtime.debug_artifacts import IterationRayRecordDumper

            extras_log = IterationRayRecordDumper(
                self._log_directory,
                self._keyframe_count,
                n_lidar=self._cfg.n_lidar_samples,
                n_sky=self._cfg.n_sky_samples if self._cfg.enable_sky else 0,
                window_slots=w,
                num_kfs=m,
                world_scale=float(self._world_scale),
                world_shift=np.asarray(self._world_shift),
                eps_min=self._cfg.loss.min_depth_eps,
                js_alpha=self._cfg.loss.js_alpha,
                max_js_score=self._cfg.loss.max_js_score,
                store_ray=self._store_ray,
                draw_samples=self._draw_samples,
                draw_rays_eps=self._draw_rays_eps,
            )
        trace_ctx = optimizer_trace(self._log_directory, self._profile_optimizer)
        trace_ctx.__enter__()
        mesh_ctx = (
            jax.set_mesh(self._mesh) if self._mesh is not None else _nullcontext()
        )
        mesh_ctx.__enter__()
        for phase in phases:
            freeze_poses = (
                phase.freeze_poses or self._freeze_poses or self._use_gt_poses
            )
            eff_phase = replace(phase, freeze_poses=freeze_poses)

            pose_mask = (1.0 - anchored).copy()
            if eff_phase.latest_kf_only:
                latest_only = np.zeros_like(pose_mask)
                latest_only[m - 1] = 1.0
                pose_mask = pose_mask * latest_only
            pose_mask = jnp.asarray(pose_mask)
            if self._mesh is not None:
                from loner_tpu.parallel.mesh import replicate

                pose_mask = replicate(pose_mask, self._mesh)

            runner = self._get_runner(eff_phase, w, p, ps)
            self._key, sub = jax.random.split(self._key)
            (
                self.state.field_params,
                self.state.occ_grid,
                twists,
                losses,
                eps_log,
            ) = runner(
                self.state.field_params,
                self.state.occ_grid,
                twists,
                buffers,
                pose_mask,
                self._world_scale,
                self._world_shift,
                self.state.global_step,
                sub,
                num_iterations=eff_phase.num_iterations,
                extras_log=extras_log,
                # Frozen-rgb phases ignore camera samples (use_camera is
                # False in their traced program) — pass None so the call's
                # pytree structure matches what warm_up precompiled;
                # a CameraWindowBuffers arg here would force a retrace of
                # the same program inside the real-time loop.
                cam_buffers=(
                    cam_buffers if not eff_phase.freeze_rgb_mlp else None
                ),
            )
            self.state.global_step += eff_phase.num_iterations
            all_losses.append(np.asarray(losses))
            all_eps.append(np.asarray(eps_log))
            if self._log_losses and self._log_directory is not None:
                from loner_tpu.runtime.debug_artifacts import log_losses as _dump_losses

                _dump_losses(
                    all_losses[-1], all_eps[-1], self._log_directory,
                    self._keyframe_count, len(all_losses) - 1,
                )

        mesh_ctx.__exit__(None, None, None)
        trace_ctx.__exit__(None, None, None)

        if extras_log is not None:
            extras_log.finish()  # store_ray accumulation (per-iteration
            # draw_samples/rays_eps files were streamed during the run)

        # Fatal non-finite checks (reference optimizer.py:368-374, 590).
        twists_np = np.asarray(twists)
        if not np.isfinite(twists_np).all():
            raise RuntimeError("Fatal: Encountered invalid pose tensor.")
        self.last_losses = np.concatenate(all_losses)
        self.last_depth_eps = np.concatenate(all_eps)
        if not np.isfinite(self.last_losses).all():
            raise RuntimeError("NaN Loss Encountered")

        if self._write_ray_point_clouds and self._log_directory is not None:
            # Dump one representative sampled ray batch (debug flag,
            # reference optimizer.py:307-312).
            from loner_tpu.mapping.rays import sample_and_build_rays
            from loner_tpu.runtime.debug_artifacts import dump_ray_point_cloud

            rays, depths_cube, valid_mask = jax.jit(
                sample_and_build_rays, static_argnums=(5, 6, 7)
            )(
                jax.random.key(0), buffers, twists, self._world_scale,
                self._world_shift, self._cfg.ray_range, self._cfg.n_lidar_samples, 0,
            )
            v = np.asarray(valid_mask)
            dump_ray_point_cloud(
                np.asarray(rays)[v], np.asarray(depths_cube)[v],
                self._log_directory, f"kf_{self._keyframe_count}",
            )

        # Write optimized poses back into the window keyframes.
        if not self._use_gt_poses:
            for i, kf in enumerate(window):
                kf.set_pose_twist(twists_np[i])

        elapsed = time.time() - start_time
        if self._log_directory is not None:
            with open(f"{self._log_directory}/timing.csv", "a+") as f:
                f.write(f"{num_its},{elapsed}\n")
        if self._verbose_timing:
            per = elapsed / max(num_its, 1)
            print(
                f"Elapsed Time: {elapsed:.3f}. Per Iteration: {per:.4f}, "
                f"Its/Sec: {1.0 / max(per, 1e-9):.2f}"
            )

        self._keyframe_count += 1
        return float(self.last_losses[-1])
