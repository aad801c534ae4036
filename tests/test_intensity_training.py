"""Intensity-head training via camera-sample supervision.

The reference parses ``freeze_rgb_mlp`` but hardwires the RGB head frozen
(src/mapping/optimizer.py:234 ``freeze_rgb_head(True)``) and never enables
its camera branch (``should_enable_camera`` returns False, :433). Here a
phase with ``freeze_rgb_mlp: False`` must actually move the intensity
parameters under the camera MSE loss — and a frozen phase must leave them
bit-identical.
"""
import pytest  # noqa: E402  (tier marker)
import jax
import numpy as np

from loner_tpu.common.camera import get_ray_directions
from loner_tpu.common.sensors import Image
from loner_tpu.datasets.synthetic import (
    LIDAR_TO_CAMERA_ROT,
    VirtualCamera,
)
from loner_tpu.mapping.loss import compute_camera_loss
from loner_tpu.mapping.optimizer import Optimizer, OptimizerConfig
from loner_tpu.models.rendering import ProposalRaySampler

from test_mapping import RAY_RANGE, make_keyframes, small_field_cfg, small_opt_cfg

# Suite tier (tests/conftest.py): full-pipeline drive, >30 s on CPU.
pytestmark = [pytest.mark.slow]


def _camera_setup(kfs, scene):
    cam = VirtualCamera(width=32, height=24, fov_deg=70.0)
    dirs, _, _ = get_ray_directions(cam.height, cam.width, cam.k)
    l2c = np.eye(4, dtype=np.float32)
    l2c[:3, :3] = LIDAR_TO_CAMERA_ROT
    for kf in kfs:
        img = cam.render(scene, kf.get_lidar_pose())
        kf._frame.image = Image(img, kf.get_time())
    return (dirs.astype(np.float32), l2c)


def _schedule(freeze_rgb: bool, n_iters: int = 25):
    return [
        {
            "num_keyframes": -1,
            "iteration_schedule": [
                {
                    "num_iterations": n_iters,
                    "freeze_poses": True,
                    "freeze_sigma_mlp": True,
                    "freeze_rgb_mlp": freeze_rgb,
                }
            ],
        }
    ]


def _make_optimizer(kfs, cube, scene, freeze_rgb: bool):
    cfg = small_opt_cfg(
        samples_strategy="PROPOSAL",
        n_camera_samples=64,
        steps_per_dispatch=5,
        prop_n_ctrl=17,
    )
    return (
        Optimizer(
            cfg,
            small_field_cfg(),
            cube.scale_factor,
            cube.shift,
            _schedule(freeze_rgb),
            camera_rays=_camera_setup(kfs, scene),
            seed=3,
        ),
        cfg,
    )


def _flat(tree):
    return np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(tree)])


def _camera_mse(opt, cfg, window):
    cam = opt._build_camera_buffers(window, len(window))
    from loner_tpu.mapping.rays import sample_and_build_camera_rays
    import jax.numpy as jnp

    twists = jnp.asarray(
        np.stack([kf.pose_twist() for kf in window]).astype(np.float32)
    )
    rays, intens, valid = sample_and_build_camera_rays(
        jax.random.key(11), cam, twists, opt._world_scale, opt._world_shift,
        cfg.ray_range, cfg.n_camera_samples,
        jnp.ones((len(window),), bool),
    )
    mse, _ = compute_camera_loss(
        None, rays, intens, valid,
        opt.state.field_params, opt._field_cfg,
        ProposalRaySampler(n_ctrl=cfg.prop_n_ctrl),
        opt.state.occ_grid,
        cfg.n_samples_per_ray, perturb=0.0,
        point_chunk=0,
    )
    return float(mse)


def test_unfrozen_rgb_trains_intensity_and_drops_camera_loss():
    kfs, cube, scene, _ = make_keyframes(3)
    opt, cfg = _make_optimizer(kfs, cube, scene, freeze_rgb=False)
    window = kfs[:2]

    before = _flat(opt.state.field_params["intensity"])
    sigma_before = _flat(opt.state.field_params["sigma"])
    mse_before = _camera_mse(opt, cfg, window)

    opt.iterate_optimizer(window)
    # A couple more keyframe rounds to accumulate training signal.
    opt.iterate_optimizer(kfs[:3])

    after = _flat(opt.state.field_params["intensity"])
    sigma_after = _flat(opt.state.field_params["sigma"])
    mse_after = _camera_mse(opt, cfg, window)

    assert not np.allclose(before, after), "intensity params never moved"
    np.testing.assert_array_equal(
        sigma_before, sigma_after, err_msg="frozen sigma params moved"
    )
    assert mse_after < 0.8 * mse_before, (
        f"camera MSE did not drop: {mse_before:.4f} -> {mse_after:.4f}"
    )


def test_frozen_rgb_keeps_intensity_bit_identical():
    kfs, cube, scene, _ = make_keyframes(2)
    opt, _ = _make_optimizer(kfs, cube, scene, freeze_rgb=True)
    before = _flat(opt.state.field_params["intensity"])
    opt.iterate_optimizer(kfs[:2])
    after = _flat(opt.state.field_params["intensity"])
    np.testing.assert_array_equal(before, after)


def test_from_settings_parses_camera_knobs():
    from loner_tpu.common.settings import Settings

    opt_settings = Settings(
        {
            "num_samples": {"lidar": 32, "sky": 0, "camera": 16},
            "rays_selection": {"strategy": "RANDOM"},
            "samples_selection": {"strategy": "UNIFORM"},
        }
    )
    model_cfg = Settings(
        {
            "model": {
                "render": {"N_samples_train": 16, "perturb": 1.0, "raw_noise_std": 0.0},
                "occ_model": {"voxel_size": 8, "lr": 1e-4, "N_iters_acc": 10},
                "ray_range": [1.0, 10.0],
            },
            "train": {
                "lrate_sigma_mlp": 0.01,
                "lrate_pose": 1e-3,
                "lrate_rgb": 0.02,
                "lrate_gamma": 1.0,
            },
            "loss": {"cameraloss_lambda": 0.5},
        }
    )
    cfg = OptimizerConfig.from_settings(opt_settings, model_cfg)
    assert cfg.n_camera_samples == 16
    assert cfg.lr_rgb == 0.02
    assert cfg.cameraloss_lambda == 0.5


def test_lidar_only_run_with_camera_samples_does_not_trace_camera_branch():
    """A camera-enabled schedule on a lidar-only run (camera_rays=None)
    must run — not dereference cam_buffers=None inside the jitted loss.
    Shared configs set num_samples.camera > 0; the lidar-only sequence
    must degrade to pure lidar supervision, loudly but gracefully."""
    kfs, cube, scene, _ = make_keyframes(2)
    cfg = small_opt_cfg(
        samples_strategy="PROPOSAL",
        n_camera_samples=64,
        steps_per_dispatch=5,
        prop_n_ctrl=17,
    )
    opt = Optimizer(
        cfg,
        small_field_cfg(),
        cube.scale_factor,
        cube.shift,
        _schedule(freeze_rgb=False, n_iters=5),
        camera_rays=None,  # lidar-only
        seed=3,
    )
    before = _flat(opt.state.field_params["intensity"])
    opt.iterate_optimizer(kfs[:2])
    after = _flat(opt.state.field_params["intensity"])
    # No camera loss -> nothing moves the intensity head's own params
    # beyond the (absent) camera branch; the run simply completes.
    assert np.isfinite(after).all()
    del before
