"""Tests for the flag-gated debug artifact writers."""
import os

import numpy as np

from loner_tpu.common.frame import Frame
from loner_tpu.common.pose import Pose
from loner_tpu.common.sensors import LidarScan
from loner_tpu.runtime.debug_artifacts import (
    dump_frame_point_cloud,
    dump_ray_point_cloud,
    log_losses,
    rays_to_points,
    visualize_loss,
)


def _scan(n=32):
    rng = np.random.default_rng(0)
    d = rng.normal(size=(3, n))
    d /= np.linalg.norm(d, axis=0)
    return LidarScan(d.astype(np.float32), np.full(n, 2.0, np.float32), np.linspace(0, 1, n))


def test_frame_cloud_dump(tmp_path):
    frame = Frame(lidar_points=_scan())
    frame._lidar_pose = Pose.identity()
    dump_frame_point_cloud(frame, str(tmp_path), 3)
    assert os.path.exists(tmp_path / "frames" / "cloud_3.pcd")


def test_ray_dump_and_endpoints(tmp_path):
    rays = np.zeros((8, 11), np.float32)
    rays[:, 3] = 1.0  # +x dirs
    depths = np.full(8, 2.5, np.float32)
    pts = rays_to_points(rays, depths)
    np.testing.assert_allclose(pts[:, 0], 2.5)
    dump_ray_point_cloud(rays, depths, str(tmp_path), "kf_0")
    assert os.path.exists(tmp_path / "rays" / "kf_0_rays.pcd")
    assert os.path.exists(tmp_path / "rays" / "kf_0_origins.pcd")


def test_loss_logs(tmp_path):
    log_losses(np.arange(5.0), np.ones(5), str(tmp_path), keyframe_count=2, phase_idx=1)
    assert os.path.exists(tmp_path / "losses" / "keyframe_2" / "phase_1.csv")
    assert os.path.exists(tmp_path / "depth_eps" / "keyframe_2" / "phase_1.csv")
    loaded = np.loadtxt(tmp_path / "losses" / "keyframe_2" / "phase_1.csv")
    np.testing.assert_allclose(loaded, np.arange(5.0))


def test_visualize_loss(tmp_path):
    z = np.linspace(1, 9, 64)[None]
    wp = np.exp(-0.5 * ((z - 5.0) / 0.5) ** 2)
    wg = wp / wp.sum()
    fname = visualize_loss(z, wp, wg, 5.0, 1.0, 0.5, str(tmp_path), global_step=7)
    assert fname is not None and os.path.exists(fname)


def _tiny_runner_extras(extras_mode, n_iters=3, steps_per_dispatch=2):
    import jax
    import jax.numpy as jnp

    from loner_tpu.mapping.optimizer import (
        OptimizerConfig,
        PhaseSettings,
        make_phase_runner,
    )
    from loner_tpu.mapping.rays import build_window_buffers
    from loner_tpu.models.field import FieldConfig, init_field_params
    from loner_tpu.models.hash_encoding import HashEncodingConfig
    from loner_tpu.models.occupancy_grid import init_occ_grid

    w = 2
    cfg = OptimizerConfig(
        n_lidar_samples=16, n_sky_samples=0, n_samples_per_ray=8,
        window_size=w, ray_range=(0.5, 10.0), occ_voxel_size=8,
        point_chunk=0, steps_per_dispatch=steps_per_dispatch,
    )
    field_cfg = FieldConfig(
        pos_encoding_sigma=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
        pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
    )
    rng = np.random.default_rng(0)
    dirs, deps = [], []
    for _ in range(w):
        d = rng.normal(size=(3, 64))
        dirs.append((d / np.linalg.norm(d, axis=0)).astype(np.float32))
        deps.append(rng.uniform(1.0, 9.0, 64).astype(np.float32))
    bufs = build_window_buffers(dirs, deps, [None] * w, w)
    runner = make_phase_runner(
        cfg, field_cfg, PhaseSettings(num_iterations=n_iters), w,
        bufs.dirs.shape[1], bufs.sky_dirs.shape[1], extras_mode=extras_mode,
    )
    log = []
    runner(
        init_field_params(jax.random.key(0), field_cfg), init_occ_grid(8),
        jnp.zeros((w, 6), jnp.float32), bufs, jnp.ones((w,)),
        jnp.asarray(12.0), jnp.zeros(3), 0, jax.random.key(1),
        num_iterations=n_iters, extras_log=log,
    )
    return log


def test_store_ray_record_collects_all_iterations():
    # n_iters a multiple of steps_per_dispatch: only the fused multi-step
    # program compiles (suite-runtime budget).
    log = _tiny_runner_extras("ray", n_iters=4, steps_per_dispatch=2)
    total = sum(r["rays"].shape[0] for r in log)
    assert total == 4
    for r in log:
        assert r["rays"].shape[-2:] == (32, 11)  # 2 slots x 16 rays
        assert r["std"].shape[-1] == 32 and r["js"].shape[-1] == 32


def test_iteration_ray_record_dump(tmp_path):
    from loner_tpu.runtime.debug_artifacts import dump_iteration_ray_record

    log = _tiny_runner_extras("full", n_iters=2, steps_per_dispatch=1)
    dump_iteration_ray_record(
        log, str(tmp_path), 4, n_lidar=16, n_sky=0, window_slots=2,
        num_kfs=2, world_scale=12.0, world_shift=np.zeros(3),
        eps_min=0.5, js_alpha=1.0, max_js_score=10.0,
        store_ray=True, draw_samples=True, draw_rays_eps=True,
    )
    # store_ray products (reference optimizer.py:393-410 layout)
    assert os.path.exists(tmp_path / "rays" / "lidar" / "kf_4.pcd")
    for name in ("sky_mask", "curr_mask", "std", "js"):
        assert os.path.exists(tmp_path / "rays" / name / "kf_4.npy")
    js = np.load(tmp_path / "rays" / "js" / "kf_4.npy")
    assert js.ndim == 1 and np.isfinite(js).all()
    # per-iteration draw_samples / draw_rays_eps products
    assert os.path.exists(tmp_path / "samples" / "samples_kf4_it0.pcd")
    assert os.path.exists(tmp_path / "samples" / "samples_kf4_it1_gt.pcd")
    assert os.path.exists(tmp_path / "rays_eps" / "rays_kf4_it1.pcd")
    # intensity column present
    with open(tmp_path / "rays_eps" / "rays_kf4_it0.pcd") as f:
        assert "FIELDS x y z intensity" in f.read()


def test_optimizer_streams_ray_records(tmp_path):
    """The Optimizer's extras sink streams per-iteration debug files
    during the run and writes store_ray accumulations at finish."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from test_mapping import make_keyframes, small_field_cfg, small_opt_cfg
    from loner_tpu.mapping.optimizer import Optimizer

    kfs, cube, _, _ = make_keyframes(2)
    opt = Optimizer(
        small_opt_cfg(n_lidar_samples=16, n_samples_per_ray=16,
                      steps_per_dispatch=2),
        small_field_cfg(),
        cube.scale_factor,
        cube.shift,
        [{"num_keyframes": -1,
          "iteration_schedule": [
              {"num_iterations": 4, "freeze_poses": True,
               "freeze_sigma_mlp": False}]}],
        use_gt_poses=True,
        seed=0,
        log_directory=str(tmp_path),
        store_ray=True,
        draw_samples=True,
        draw_rays_eps=True,
    )
    opt.iterate_optimizer(kfs[:1])
    assert os.path.exists(tmp_path / "rays" / "lidar" / "kf_0.pcd")
    assert os.path.exists(tmp_path / "rays" / "js" / "kf_0.npy")
    # draw_samples/rays_eps files exist for every iteration index
    for i in range(4):
        assert os.path.exists(tmp_path / "samples" / f"samples_kf0_it{i}.pcd"), i
        assert os.path.exists(tmp_path / "rays_eps" / f"rays_kf0_it{i}.pcd"), i
