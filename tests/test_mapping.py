"""End-to-end mapping tests: the optimizer learns the synthetic scene.

This is BASELINE config #1 (mapping-only fit with GT poses, CPU-runnable)
at reduced scale: the held-out L1 depth must drop substantially after
optimization.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loner_tpu.common.frame import Frame
from loner_tpu.common.pose import Pose
from loner_tpu.common.settings import Settings
from loner_tpu.common.world_cube import compute_world_cube
from loner_tpu.datasets.synthetic import BoxRoomScene, VirtualLidar, generate_sequence
from loner_tpu.mapping.keyframe import KeyFrame
from loner_tpu.mapping.keyframe_manager import KeyFrameManager
from loner_tpu.mapping.loss import LossConfig
from loner_tpu.mapping.optimizer import Optimizer, OptimizerConfig, PhaseSettings
from loner_tpu.models.field import FieldConfig
from loner_tpu.models.hash_encoding import HashEncodingConfig
from loner_tpu.models.rendering import UniformRaySampler, pack_rays, render_rays


RAY_RANGE = (0.5, 14.0)


def small_field_cfg():
    # Sized for the 1-core CPU test host: ~0.1 s/iteration.
    return FieldConfig(
        pos_encoding_sigma=HashEncodingConfig(
            n_levels=6, log2_hashmap_size=14, base_resolution=16, per_level_scale=1.5
        ),
        pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=12),
    )


def small_opt_cfg(**kw):
    defaults = dict(
        n_lidar_samples=128,
        n_sky_samples=0,
        n_samples_per_ray=64,
        window_size=3,
        occ_voxel_size=32,
        ray_range=RAY_RANGE,
        loss=LossConfig(),
    )
    defaults.update(kw)
    return OptimizerConfig(**defaults)


def make_keyframes(num=6):
    scans, poses, ts, scene, lidar = generate_sequence(
        num_scans=num,
        lidar=VirtualLidar(num_channels=16, num_columns=128, max_range=30.0),
        rate_hz=2.0,
    )
    # Zero the origin with the LEFT inverse (a global world-frame change,
    # preserving multi-scan consistency — matches build_poses_from_df's
    # zero_origin, reference pose_utils.py:336-341).
    zeroed = np.linalg.inv(poses[0])[None] @ poses
    cube = compute_world_cube(None, None, None, zeroed, RAY_RANGE, padding=0.3)
    kfs = []
    for scan, pose in zip(scans, zeroed):
        f = Frame(lidar_points=scan)
        f._lidar_pose = Pose(pose)
        f._gt_lidar_pose = Pose(pose)
        kfs.append(KeyFrame(f))
    return kfs, cube, scene, zeroed


def held_out_l1(optimizer, kf, cube, n=256, seed=7):
    """L1 depth (meters) on random held-out rays of a keyframe."""
    rng = np.random.default_rng(seed)
    scan = kf.get_lidar_scan()
    idx = rng.integers(0, len(scan), n)
    dirs_s = scan.ray_directions[:, idx]
    gt_m = scan.distances[idx]
    mat = kf.get_lidar_pose().matrix
    dirs_w = (mat[:3, :3] @ dirs_s).T
    origins = np.broadcast_to((mat[:3, 3] + cube.shift) / cube.scale_factor, dirs_w.shape)
    near = np.full(n, RAY_RANGE[0] / cube.scale_factor, np.float32)
    far = np.full(n, RAY_RANGE[1] / cube.scale_factor, np.float32)
    rays = pack_rays(
        jnp.asarray(origins, jnp.float32),
        jnp.asarray(dirs_w, jnp.float32),
        jnp.asarray(near),
        jnp.asarray(far),
    )
    out = render_rays(
        None, rays, optimizer.state.field_params, optimizer._field_cfg,
        UniformRaySampler(), n_samples=192, perturb=0.0, sigma_only=True,
    )
    depth_m = np.asarray(out["depth"]) * cube.scale_factor
    mask = gt_m < RAY_RANGE[1]
    return float(np.abs(depth_m[mask] - gt_m[mask]).mean())


SCHEDULE = [
    {
        "num_keyframes": 1,
        "iteration_schedule": [
            {"num_iterations": 90, "freeze_poses": True, "freeze_sigma_mlp": False}
        ],
    },
    {
        "num_keyframes": -1,
        "iteration_schedule": [
            {
                "num_iterations": 15,
                "freeze_poses": False,
                "latest_kf_only": True,
                "freeze_sigma_mlp": True,
            },
            {"num_iterations": 30, "freeze_poses": False, "freeze_sigma_mlp": False},
        ],
    },
]


class TestMappingFit:
    @pytest.fixture(scope="class")
    def fitted(self):
        kfs, cube, scene, poses = make_keyframes(4)
        opt = Optimizer(
            small_opt_cfg(),
            small_field_cfg(),
            cube.scale_factor,
            cube.shift,
            SCHEDULE,
            use_gt_poses=True,
            seed=0,
        )
        l1_before = held_out_l1(opt, kfs[0], cube)
        window = []
        for kf in kfs:
            window.append(kf)
            opt.iterate_optimizer(window[-3:])
        return opt, kfs, cube, l1_before

    def test_loss_decreases(self, fitted):
        opt, _, _, _ = fitted
        assert np.isfinite(opt.last_losses).all()

    def test_held_out_l1_improves(self, fitted):
        opt, kfs, cube, l1_before = fitted
        # Evaluate on the most recent keyframe: the test window is
        # most-recent-4, so the oldest region is subject to (reference-like)
        # forgetting; full runs use HYBRID random windows to counter it.
        l1_after = held_out_l1(opt, kfs[-1], cube)
        assert l1_after < l1_before * 0.5, (l1_before, l1_after)
        assert l1_after < 3.0, f"L1 depth {l1_after} m too large"

    def test_occ_grid_learned(self, fitted):
        opt, _, _, _ = fitted
        occ = np.asarray(opt.state.occ_grid)
        # Grid must have moved away from all-zeros (free + occupied bands).
        assert np.abs(occ).max() > 1e-4
        assert occ.min() < 0 < occ.max()


class TestPoseRefinement:
    def test_joint_optimization_reduces_pose_error(self):
        """Perturb one pose; joint phase should pull it back toward GT."""
        kfs, cube, _, poses = make_keyframes(3)
        opt = Optimizer(
            small_opt_cfg(lr_pose=5e-3),
            small_field_cfg(),
            cube.scale_factor,
            cube.shift,
            [
                {
                    "num_keyframes": 1,
                    "iteration_schedule": [
                        {"num_iterations": 100, "freeze_poses": True, "freeze_sigma_mlp": False}
                    ],
                },
                {
                    "num_keyframes": -1,
                    "iteration_schedule": [
                        {"num_iterations": 50, "freeze_poses": False, "freeze_sigma_mlp": False}
                    ],
                },
            ],
            seed=1,
        )
        # Map the first two keyframes at GT poses.
        for i in range(2):
            opt.iterate_optimizer(kfs[: i + 1])

        # Perturb keyframe 2's pose and let the joint phase refine it.
        gt = kfs[2].get_lidar_pose().clone()
        delta = np.array([0.12, -0.1, 0.04, 0.0, 0.0, 0.02])
        kfs[2].set_pose_twist(gt.to_twist() + delta)
        err_before, _ = gt.distance_to(kfs[2].get_lidar_pose())

        opt.iterate_optimizer(kfs)
        err_after, _ = gt.distance_to(kfs[2].get_lidar_pose())
        assert err_after < err_before, (err_before, err_after)

    # Pose-freeze semantics don't need a converged map — a few iterations
    # exercise the exact same masking code paths (suite-runtime budget).
    TINY_SCHEDULE = [
        {
            "num_keyframes": 1,
            "iteration_schedule": [
                {"num_iterations": 6, "freeze_poses": True, "freeze_sigma_mlp": False}
            ],
        },
        {
            "num_keyframes": -1,
            "iteration_schedule": [
                {"num_iterations": 6, "freeze_poses": False, "freeze_sigma_mlp": False}
            ],
        },
    ]

    def test_anchored_pose_fixed(self):
        kfs, cube, _, _ = make_keyframes(2)
        opt = Optimizer(
            small_opt_cfg(),
            small_field_cfg(),
            cube.scale_factor,
            cube.shift,
            self.TINY_SCHEDULE,
            seed=2,
        )
        t0 = kfs[0].pose_twist().copy()
        opt.iterate_optimizer(kfs[:1])  # anchors kf0
        opt.iterate_optimizer(kfs)
        np.testing.assert_allclose(kfs[0].pose_twist(), t0, atol=1e-7)

    def test_gt_poses_never_move(self):
        kfs, cube, _, _ = make_keyframes(2)
        opt = Optimizer(
            small_opt_cfg(),
            small_field_cfg(),
            cube.scale_factor,
            cube.shift,
            self.TINY_SCHEDULE,
            use_gt_poses=True,
            seed=3,
        )
        t1 = kfs[1].pose_twist().copy()
        opt.iterate_optimizer(kfs[:1])
        opt.iterate_optimizer(kfs)
        np.testing.assert_allclose(kfs[1].pose_twist(), t1, atol=1e-7)


class TestKeyFrameManager:
    def _mgr(self, strategy="TEMPORAL", window="HYBRID"):
        s = Settings(
            {
                "keyframe_selection": {
                    "strategy": strategy,
                    "temporal": {"time_diff_seconds": 3.0},
                    "motion": {"translation_threshold_m": 0.5, "rotation_threshold_deg": 22.5},
                },
                "window_selection": {
                    "strategy": window,
                    "window_size": 4,
                    "hybrid_settings": {"num_recent_frames": 1},
                },
            }
        )
        return KeyFrameManager(s)

    def _frame(self, t, pose=None):
        from loner_tpu.common.sensors import LidarScan

        scan = LidarScan(
            np.ones((3, 4), np.float32) / np.sqrt(3),
            np.ones(4, np.float32),
            np.full(4, t, np.float64),
        )
        f = Frame(lidar_points=scan)
        f._lidar_pose = pose or Pose.identity()
        f._gt_lidar_pose = f._lidar_pose.clone()
        return f

    def test_temporal_gating(self):
        mgr = self._mgr()
        assert mgr.process_frame(self._frame(0.0)) is not None
        assert mgr.process_frame(self._frame(1.0)) is None
        assert mgr.process_frame(self._frame(3.5)) is not None
        assert len(mgr) == 2

    def test_motion_gating(self):
        mgr = self._mgr(strategy="MOTION")
        assert mgr.process_frame(self._frame(0.0)) is not None
        near = Pose.from_twist(np.array([0.1, 0, 0, 0, 0, 0]))
        assert mgr.process_frame(self._frame(1.0, near)) is None
        far = Pose.from_twist(np.array([1.0, 0, 0, 0, 0, 0]))
        assert mgr.process_frame(self._frame(2.0, far)) is not None

    def test_rebasing_applies_optimized_correction(self):
        mgr = self._mgr()
        mgr.process_frame(self._frame(0.0))
        # Optimizer moved kf0 by +1 in x.
        mgr._keyframes[0].set_pose_twist(np.array([1.0, 0, 0, 0, 0, 0]))
        tracked = Pose.from_twist(np.array([0.5, 0, 0, 0, 0, 0]))
        kf2 = mgr.process_frame(self._frame(5.0, tracked))
        # New pose = optimized_ref @ (ref_tracked^-1 @ new_tracked) = 1.5 in x.
        np.testing.assert_allclose(
            kf2.get_lidar_pose().get_translation(), [1.5, 0, 0], atol=1e-9
        )

    def test_window_selection_recent_last(self):
        mgr = self._mgr()
        for t in [0.0, 3.0, 6.0, 9.0, 12.0, 15.0]:
            mgr.process_frame(self._frame(t))
        window = mgr.get_active_window()
        assert len(window) == 4
        assert window[-1] is mgr._keyframes[-1]

    def test_window_smaller_than_keyframes(self):
        mgr = self._mgr()
        mgr.process_frame(self._frame(0.0))
        assert len(mgr.get_active_window()) == 1


class TestMaskRayStrategy:
    """MASK rays-selection (reference optimizer.py:289-292): sampling is
    restricted to mask-true scan points via window-buffer pre-filtering."""

    def _keyframe_with_mask(self):
        from loner_tpu.common.sensors import LidarScan

        rng = np.random.default_rng(3)
        n = 64
        d = rng.normal(size=(3, n))
        d /= np.linalg.norm(d, axis=0)
        mask = np.zeros(n, bool)
        mask[: n // 4] = True
        scan = LidarScan(
            d.astype(np.float32),
            np.full(n, 5.0, np.float32),
            np.linspace(0, 1, n),
            mask=mask,
        )
        frame = Frame(lidar_points=scan)
        frame._lidar_pose = Pose.identity()
        return KeyFrame(frame), mask

    def test_mask_prefilters_buffers(self):
        kf, mask = self._keyframe_with_mask()
        assert kf.scan_dirs(use_mask=True).shape[1] == mask.sum()
        assert kf.scan_depths(use_mask=True).shape[0] == mask.sum()
        # RANDOM/FIXED ignore the mask (reference samples all indices).
        assert kf.scan_dirs(use_mask=False).shape[1] == mask.size

    def test_unknown_strategy_rejected(self):
        s = Settings(
            {
                "num_samples": {"lidar": 8, "sky": 0},
                "rays_selection": {"strategy": "BOGUS"},
                "samples_selection": {"strategy": "UNIFORM"},
            }
        )
        model_cfg = Settings(
            {
                "model": {
                    "render": {
                        "N_samples_train": 8, "perturb": 1.0, "raw_noise_std": 0.0,
                    },
                    "occ_model": {"voxel_size": 8, "lr": 1e-4, "N_iters_acc": 10},
                    "ray_range": [0.5, 10.0],
                },
                "train": {
                    "lrate_sigma_mlp": 0.01, "lrate_pose": 1e-3, "lrate_gamma": 1.0,
                },
                "loss": {"loss_selection": "L1_JS"},
            }
        )
        with pytest.raises(RuntimeError, match="rays_selection"):
            OptimizerConfig.from_settings(s, model_cfg)


class TestWarmUp:
    """Optimizer.warm_up pre-compiles every reachable phase runner."""

    def test_warm_up_fills_runner_cache(self):
        scans, poses, ts, scene, lidar = generate_sequence(
            num_scans=3,
            lidar=VirtualLidar(num_channels=16, num_columns=128, max_range=30.0),
            rate_hz=2.0,
        )
        gt_zeroed = np.linalg.inv(poses[0])[None] @ poses
        cube = compute_world_cube(None, None, None, gt_zeroed, list(RAY_RANGE))
        opt = Optimizer(
            small_opt_cfg(steps_per_dispatch=4),
            small_field_cfg(),
            cube.scale_factor,
            cube.shift,
            [
                {
                    "num_keyframes": 1,
                    "iteration_schedule": [
                        {"num_iterations": 6, "freeze_poses": True,
                         "freeze_sigma_mlp": False}
                    ],
                },
                {
                    "num_keyframes": -1,
                    "iteration_schedule": [
                        {"num_iterations": 6, "freeze_poses": False,
                         "freeze_sigma_mlp": False}
                    ],
                },
            ],
            seed=3,
        )
        n_points = scans[0].ray_directions.shape[1]
        dt = opt.warm_up(n_points)
        assert dt > 0
        # Two distinct phases (freeze_poses True/False) -> two runners.
        assert len(opt._runner_cache) == 2
        # A real window at the same point count reuses the cache (no new
        # runner keys -> no new compiles).
        frame = Frame(lidar_points=scans[0])
        frame._lidar_pose = Pose(gt_zeroed[0])
        frame._gt_lidar_pose = Pose(gt_zeroed[0])
        kf = KeyFrame(frame)
        opt.iterate_optimizer([kf])
        assert len(opt._runner_cache) == 2


class TestDeviceScanPool:
    def test_matches_host_builder_and_uploads_once(self):
        from loner_tpu.mapping.rays import DeviceScanPool, build_window_buffers

        kfs, cube, _, _ = make_keyframes(3)
        pool = DeviceScanPool()
        win = kfs[:3]
        a = pool.build_window(win, 4, use_mask=False)
        b = build_window_buffers(
            [kf.scan_dirs(False) for kf in win],
            [kf.scan_depths(False) for kf in win],
            [kf.sky_dirs() for kf in win],
            4,
        )
        for name in ("dirs", "depths", "counts", "sky_dirs", "sky_counts", "slot_valid"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name)), err_msg=name
            )
        # Second window shares 2 of 3 keyframes: only the new scan packs.
        n_entries = len(pool._entries)
        pool.build_window(kfs[1:3], 4, use_mask=False)
        assert len(pool._entries) == n_entries  # all already resident


def test_mask_strategy_through_scan_pool():
    """MASK windows built via the device scan pool contain only the
    mask-true points (pow2-padded)."""
    from loner_tpu.common.sensors import LidarScan
    from loner_tpu.mapping.rays import DeviceScanPool

    rng = np.random.default_rng(9)
    n = 64
    d = rng.normal(size=(3, n))
    d /= np.linalg.norm(d, axis=0)
    mask = np.zeros(n, bool)
    mask[::2] = True
    scan = LidarScan(
        d.astype(np.float32), np.full(n, 4.0, np.float32),
        np.linspace(0, 1, n), mask=mask,
    )
    frame = Frame(lidar_points=scan)
    frame._lidar_pose = Pose.identity()
    kf = KeyFrame(frame)

    pool = DeviceScanPool()
    buffers = pool.build_window([kf], 2, use_mask=True)
    assert int(buffers.counts[0]) == mask.sum()
    np.testing.assert_allclose(
        np.asarray(buffers.dirs[0, : mask.sum()]), d[:, mask].T, atol=1e-6
    )
    # The same pool keyed separately for unmasked use.
    full = pool.build_window([kf], 2, use_mask=False)
    assert int(full.counts[0]) == n


class TestWindowSizeClasses:
    """The KF#1 bootstrap runs a width-1 program (the full-window program
    would spend W-1/W of its compute on masked-out replica slots)."""

    def _schedule(self):
        return [
            {
                "num_keyframes": 1,
                "iteration_schedule": [
                    {"num_iterations": 8, "freeze_poses": True,
                     "freeze_sigma_mlp": False}
                ],
            },
            {
                "num_keyframes": -1,
                "iteration_schedule": [
                    {"num_iterations": 4, "freeze_poses": False,
                     "freeze_sigma_mlp": False}
                ],
            },
        ]

    def test_bootstrap_uses_width_one_then_full(self):
        kfs, cube, _, _ = make_keyframes(4)
        opt = Optimizer(
            small_opt_cfg(steps_per_dispatch=4),
            small_field_cfg(),
            cube.scale_factor,
            cube.shift,
            self._schedule(),
            seed=3,
        )
        opt.iterate_optimizer([kfs[0]])
        widths = {key[1] for key in opt._runner_cache}
        assert widths == {1}
        assert np.isfinite(opt.last_losses).all()

        opt.iterate_optimizer(kfs[:3])
        widths = {key[1] for key in opt._runner_cache}
        assert widths == {1, opt._cfg.window_size}
        assert np.isfinite(opt.last_losses).all()
        # Optimized poses were written back finite.
        for kf in kfs[:3]:
            assert np.isfinite(kf.pose_twist()).all()

    def test_warm_up_covers_both_width_classes(self):
        kfs, cube, _, _ = make_keyframes(2)
        opt = Optimizer(
            small_opt_cfg(steps_per_dispatch=4),
            small_field_cfg(),
            cube.scale_factor,
            cube.shift,
            self._schedule(),
            seed=3,
        )
        n_points = kfs[0].scan_dirs().shape[1]
        opt.warm_up(n_points)
        cached = len(opt._runner_cache)
        assert {key[1] for key in opt._runner_cache} == {1, opt._cfg.window_size}
        # Real windows at the same point count add no new runner keys.
        opt.iterate_optimizer([kfs[0]])
        opt.iterate_optimizer(kfs[:2])
        assert len(opt._runner_cache) == cached
