"""Open-sky scene + end-to-end sky-ray supervision.

The reference treats sky supervision as a real feature (sky-ray
extraction tracker.py:257-296; sky rays appended with far depth,
keyframe.py:87-101; 64 sky samples/KF, defaults.yaml:60) but it only
matters outdoors. These tests drive it on the ceiling-less box room
(BoxRoomScene(open_top=True)): extraction finds real sky, and training
WITH sky supervision renders measurably lower opacity above the horizon
than training without it (the floater-suppression effect the loss
exists for).
"""
import jax
import numpy as np

from loner_tpu.common.frame import Frame
from loner_tpu.common.pose import Pose
from loner_tpu.datasets.synthetic import BoxRoomScene, VirtualLidar, make_scan
from loner_tpu.tracking.tracker import Tracker


def _sky_scan(pose_xyz=(0.0, 0.0, 1.0), channels=32, columns=256):
    scene = BoxRoomScene(open_top=True)
    lidar = VirtualLidar(
        num_channels=channels, num_columns=columns,
        vertical_fov_deg=(-30.0, 45.0), max_range=40.0,
    )
    pose = np.eye(4)
    pose[:3, 3] = pose_xyz
    scan = make_scan(scene, lidar, Pose(pose), 0.0, seed=0)
    return scan, pose


def test_open_top_raycast_drops_sky_rays():
    scene_closed = BoxRoomScene()
    scene_open = BoxRoomScene(open_top=True)
    o = np.zeros((3, 3))
    o[:, 2] = 1.0
    d = np.array([[0.0, 0.0, 1.0], [0.3, 0.0, 0.95], [1.0, 0.0, -0.1]])
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    closed = scene_closed.raycast(o, d)
    opened = scene_open.raycast(o, d)
    assert np.all(np.isfinite(closed))
    assert np.isinf(opened[0]) and np.isinf(opened[1])  # up through the top
    np.testing.assert_allclose(opened[2], closed[2])  # wall hit unchanged


def test_sky_extraction_on_open_sky_sweep():
    """A real raycast sweep of the open-top room yields sky directions
    above the horizon; the closed room yields (near) none."""
    scan, pose = _sky_scan()
    frame = Frame(lidar_points=scan)
    frame._lidar_pose = Pose(pose)
    Tracker.compute_sky_rays(object.__new__(Tracker), frame)
    sky = frame.lidar_points.sky_rays
    assert sky is not None and sky.shape[1] > 20
    elev = 90.0 - np.rad2deg(
        np.arctan2(np.sqrt(sky[0] ** 2 + sky[1] ** 2), sky[2])
    )
    assert np.all(elev > 10.0 - 1e-6)

    closed_scene = BoxRoomScene()
    lidar = VirtualLidar(
        num_channels=32, num_columns=256,
        vertical_fov_deg=(-30.0, 45.0), max_range=40.0,
    )
    closed_scan = make_scan(closed_scene, lidar, Pose(pose), 0.0, seed=0)
    closed_frame = Frame(lidar_points=closed_scan)
    closed_frame._lidar_pose = Pose(pose)
    Tracker.compute_sky_rays(object.__new__(Tracker), closed_frame)
    closed_sky = closed_frame.lidar_points.sky_rays
    n_closed = 0 if closed_sky is None else closed_sky.shape[1]
    assert n_closed < sky.shape[1] / 4


def _skylight_scan(channels=48, columns=256):
    """Sweep of the SKYLIGHT room: a 4x3 m ceiling opening with ceiling
    returns all around it, so the sky cells are interior to the
    spherical image — angularly separated from any wall return (the
    open-top room's sky dirs hug the roofline, where a smooth field
    cannot distinguish sky from the adjacent wall edge)."""
    scene = BoxRoomScene(
        top_opening=(np.array([-2.0, -1.5]), np.array([2.0, 1.5]))
    )
    lidar = VirtualLidar(
        num_channels=channels, num_columns=columns,
        vertical_fov_deg=(-30.0, 80.0), max_range=40.0,
    )
    pose = np.eye(4)
    pose[:3, 3] = [0.0, 0.0, 0.5]
    scan = make_scan(scene, lidar, Pose(pose), 0.0, seed=0)
    return scan, pose


def _train_field(enable_sky: bool, iters: int = 300):
    """Small mapping-only fit on one skylight keyframe; returns the
    mean rendered opacity along the high-elevation sky directions."""
    from loner_tpu.mapping.keyframe import KeyFrame
    from loner_tpu.mapping.optimizer import Optimizer, OptimizerConfig
    from loner_tpu.models.field import FieldConfig, FourierConfig, MLPConfig
    from loner_tpu.models.hash_encoding import HashEncodingConfig
    from loner_tpu.models.rendering import UniformRaySampler, pack_rays, render_rays

    scan, pose = _skylight_scan()
    frame = Frame(lidar_points=scan)
    frame._lidar_pose = Pose(pose)
    Tracker.compute_sky_rays(object.__new__(Tracker), frame)
    assert frame.lidar_points.sky_rays.shape[1] > 0

    cfg = OptimizerConfig(
        n_lidar_samples=256,
        n_sky_samples=64,
        n_samples_per_ray=64,
        window_size=1,
        ray_range=(0.3, 18.0),
        samples_strategy="UNIFORM",
        enable_sky=enable_sky,
        point_chunk=0,
        raw_noise_std=0.0,
    )
    field_cfg = FieldConfig(
        encoding_sigma="fourier",
        fourier_sigma=FourierConfig(n_freqs=32, scale=8.0),
        sigma_mlp=MLPConfig(n_neurons=64, n_hidden_layers=2, output_dim=1),
        density_activation="softplus", sigma_mlp_bias=True,
        sigma_kernel="xla",
        pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
    )
    schedule = [{
        "num_keyframes": -1,
        "iteration_schedule": [
            {"num_iterations": iters, "freeze_poses": True,
             "freeze_sigma_mlp": False, "freeze_rgb_mlp": True},
        ],
    }]
    world_scale = 10.0
    opt = Optimizer(
        cfg, field_cfg, world_scale=world_scale,
        world_shift=np.zeros(3, np.float32),
        keyframe_schedule=schedule, seed=3,
    )
    opt.iterate_optimizer([KeyFrame(frame)])

    # Probe along extracted sky directions WELL inside the skylight
    # (elev > 50 deg): these rays have no lidar return — only the sky
    # supervision can make them transparent — and they are several tens
    # of degrees from the nearest wall/ceiling return, within the
    # field's angular resolution.
    sky = frame.lidar_points.sky_rays
    elev = 90.0 - np.rad2deg(
        np.arctan2(np.sqrt(sky[0] ** 2 + sky[1] ** 2), sky[2])
    )
    sel = elev > 50.0
    assert sel.sum() > 10, f"only {sel.sum()} interior sky dirs"
    d = sky[:, sel].T.astype(np.float32)
    n = len(d)
    o = np.broadcast_to(np.array([0.0, 0.0, 0.5], np.float32), (n, 3)) / world_scale
    import jax.numpy as jnp

    rays = pack_rays(
        jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32),
        jnp.full((n,), 0.3 / world_scale), jnp.full((n,), 18.0 / world_scale),
    )
    out = render_rays(
        jax.random.key(0), rays, opt.state.field_params, field_cfg,
        UniformRaySampler(), n_samples=128, perturb=0.0, sigma_only=True,
    )
    return float(np.mean(np.asarray(out["opacity"])))


def test_sky_supervision_reduces_sky_opacity():
    op_with = _train_field(enable_sky=True)
    op_without = _train_field(enable_sky=False)
    # Sky supervision must carve the air above the horizon: the sky-ray
    # probe renders substantially more transparent with it on.
    assert op_with < op_without * 0.6, (op_with, op_without)
    assert op_with < 0.35, op_with
