"""Shared utilities for the offline analysis tools: checkpoint loading and
chunked field rendering at test-time sample counts.

Counterparts of the reference's checkpoint-reload preamble duplicated
across analysis/renderer.py:149-183, renderer_lidar.py:139-183,
meshing.py:104-115 and compute_l1_depth.py:148-156.
"""
from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.common.pose import Pose
from loner_tpu.common.settings import Settings
from loner_tpu.common.world_cube import WorldCube
from loner_tpu.mapping.rays import get_far_val
from loner_tpu.models.field import FieldConfig
from loner_tpu.models.rendering import pack_rays


@dataclass
class LoadedModel:
    field_params: dict
    field_cfg: FieldConfig
    occ_grid: Optional[jnp.ndarray]
    world_cube: WorldCube
    settings: Settings
    poses: list  # keyframe pose states
    global_step: int
    # jitted chunk-renderer executables, keyed by render options
    # (see analysis._render_impl.get_chunk_renderer)
    render_cache: dict = field(default_factory=dict, repr=False)


def load_experiment(log_dir: str, ckpt_name: str = "final.tar") -> LoadedModel:
    """Load full_config.pkl + a checkpoint from an experiment directory."""
    with open(os.path.join(log_dir, "full_config.pkl"), "rb") as f:
        settings = Settings(pickle.load(f))
    with open(os.path.join(log_dir, "checkpoints", ckpt_name), "rb") as f:
        ckpt = pickle.load(f)

    world_cube = WorldCube.from_dict(ckpt.get("world_cube") or settings["world_cube"])
    model_cfg = settings.mapper.optimizer.model_config
    field_cfg = FieldConfig.from_settings(
        model_cfg["model"]["nerf_config"], int(model_cfg["model"]["num_colors"])
    )
    params = jax.tree.map(jnp.asarray, ckpt["network_state_dict"])
    occ = ckpt.get("occ_model_state_dict")
    if occ is not None:
        occ = jax.tree.map(jnp.asarray, occ)  # grid array or proposal pytree
    return LoadedModel(
        field_params=params,
        field_cfg=field_cfg,
        occ_grid=occ,
        world_cube=world_cube,
        settings=settings,
        poses=ckpt.get("poses", []),
        global_step=int(ckpt.get("global_step", 0)),
    )


def kf_pose_matrices(model: LoadedModel, use_gt: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """(K, 4, 4) keyframe poses + (K,) timestamps from the checkpoint."""
    key = "gt_lidar_pose" if use_gt else "lidar_pose"
    mats, ts = [], []
    for state in model.poses:
        mats.append(Pose.from_twist(state[key]).matrix)
        ts.append(state["timestamp"])
    return np.stack(mats), np.asarray(ts)


def render_depth_chunked(
    model: LoadedModel,
    origins_world: np.ndarray,  # (N, 3) meters
    dirs_world: np.ndarray,  # (N, 3) unit
    ray_range: Tuple[float, float],
    n_samples: int = 2048,
    chunk: int = 2048,
    ret_var: bool = True,
    use_occ: bool = True,
    with_intensity: bool = False,
    with_peak: bool = False,
) -> dict:
    """Render expected depth (meters) + variance along world-frame rays.

    Chunked like the reference's test-time path (model_tcnn.py:82-99 with
    N_samples_test=2048); deterministic (no perturb/noise).
    ``with_intensity`` also composites the trained intensity head's color
    (adds an 'rgb' (N, C) output). ``with_peak`` adds per-ray
    peak-depth consistency in meters (reference renderer.py:197-203).
    """
    from loner_tpu.analysis._render_impl import get_chunk_renderer

    cube = model.world_cube
    n = origins_world.shape[0]
    render_chunk = get_chunk_renderer(
        model, n_samples, ret_var, use_occ, sigma_only=not with_intensity,
        ret_peak=with_peak,
    )
    occ = model.occ_grid if use_occ else None

    # Pad to a whole number of chunks so every dispatch shares ONE
    # compiled program (a ragged tail would compile a second one).
    n_padded = ((n + chunk - 1) // chunk) * chunk
    o_all = np.concatenate(
        [origins_world, np.repeat(origins_world[:1], n_padded - n, axis=0)]
    )
    d_all = np.concatenate(
        [dirs_world, np.repeat(dirs_world[:1], n_padded - n, axis=0)]
    )

    depths, variances, opacities, rgbs, peaks = [], [], [], [], []
    for i in range(0, n_padded, chunk):
        o = o_all[i : i + chunk]
        d = d_all[i : i + chunk]
        o_cube = jnp.asarray(cube.to_cube(o), jnp.float32)
        d_cube = jnp.asarray(d, jnp.float32)
        near = jnp.full((o.shape[0],), ray_range[0] / cube.scale_factor, jnp.float32)
        far_clip = get_far_val(o_cube, d_cube)
        far = jnp.minimum(ray_range[1] / cube.scale_factor, far_clip)
        rays = pack_rays(o_cube, d_cube, near, far)
        out = render_chunk(rays, model.field_params, occ)
        depths.append(np.asarray(out["depth"]) * cube.scale_factor)
        opacities.append(np.asarray(out["opacity"]))
        if with_intensity:
            rgbs.append(np.asarray(out["rgb"]))
        if with_peak:
            peaks.append(
                np.asarray(out["peak_depth_consistency"]) * cube.scale_factor
            )
        if ret_var:
            variances.append(np.asarray(out["variance"]) * cube.scale_factor ** 2)

    result = {
        "depth": np.concatenate(depths)[:n],
        "opacity": np.concatenate(opacities)[:n],
    }
    if with_intensity:
        result["rgb"] = np.concatenate(rgbs)[:n]
    if with_peak:
        result["peak_depth_consistency"] = np.concatenate(peaks)[:n]
    if ret_var:
        result["variance"] = np.concatenate(variances)[:n]
    return result
