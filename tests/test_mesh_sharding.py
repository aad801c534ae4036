"""Multi-chip shard correctness: the sharded training step must compute
the SAME result as the unsharded one.

Runs on the 8-device virtual CPU mesh (conftest). Keyframe-window slots
shard across devices; field/proposal/occ state is replicated and GSPMD
all-reduces its gradients — numerically this must be a no-op vs one
device (deterministic same-seed comparison, modulo float reduction
order)."""
import jax
import jax.numpy as jnp
import numpy as np

from loner_tpu.mapping.optimizer import OptimizerConfig, PhaseSettings, make_phase_runner
from loner_tpu.mapping.rays import build_window_buffers
from loner_tpu.models.field import FieldConfig, init_field_params
from loner_tpu.models.hash_encoding import HashEncodingConfig
from loner_tpu.models.occupancy_grid import init_occ_grid
from loner_tpu.parallel.mesh import make_mesh, replicate, shard_window_buffers


def _setup(w=8):
    cfg = OptimizerConfig(
        n_lidar_samples=32, n_sky_samples=0, n_samples_per_ray=16,
        window_size=w, occ_voxel_size=8, ray_range=(0.5, 12.0),
        point_chunk=0, steps_per_dispatch=3,
    )
    field_cfg = FieldConfig(
        pos_encoding_sigma=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
        pos_encoding_intensity=HashEncodingConfig(n_levels=2, log2_hashmap_size=10),
    )
    rng = np.random.default_rng(0)
    dirs, deps = [], []
    for _ in range(w):
        d = rng.normal(size=(3, 256))
        dirs.append((d / np.linalg.norm(d, axis=0)).astype(np.float32))
        deps.append(rng.uniform(1.0, 10.0, 256).astype(np.float32))
    buffers = build_window_buffers(dirs, deps, [None] * w, w)
    phase = PhaseSettings(num_iterations=3)
    runner = make_phase_runner(
        cfg, field_cfg, phase, w, buffers.dirs.shape[1], buffers.sky_dirs.shape[1]
    )
    return field_cfg, buffers, runner, w


def _run(runner, field_cfg, buffers, w, mesh=None):
    params = init_field_params(jax.random.key(0), field_cfg)
    occ = init_occ_grid(8)
    twists = jnp.zeros((w, 6), jnp.float32)
    pose_mask = jnp.ones((w,), jnp.float32)
    if mesh is not None:
        buffers = shard_window_buffers(buffers, mesh)
        params = replicate(params, mesh)
        occ = replicate(occ, mesh)
        twists = replicate(twists, mesh)
        pose_mask = replicate(pose_mask, mesh)
        ctx = jax.set_mesh(mesh)
    else:
        import contextlib

        ctx = contextlib.nullcontext()
    with ctx:
        new_params, new_occ, new_twists, losses, _ = runner(
            params, occ, twists, buffers, pose_mask,
            jnp.asarray(12.0, jnp.float32), jnp.zeros(3, jnp.float32),
            0, jax.random.key(1), num_iterations=3,
        )
    return (
        np.asarray(losses),
        np.asarray(new_twists),
        jax.tree.map(np.asarray, new_params),
    )


def test_sharded_step_matches_single_device():
    field_cfg, buffers, runner, w = _setup()
    losses_1, twists_1, params_1 = _run(runner, field_cfg, buffers, w, mesh=None)
    mesh = make_mesh(8)
    losses_8, twists_8, params_8 = _run(runner, field_cfg, buffers, w, mesh=mesh)

    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(twists_8, twists_1, rtol=2e-4, atol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-6),
        params_1,
        params_8,
    )


def test_2d_kf_x_ray_mesh_matches_single_device():
    """(kf x ray) mesh: window slots data-parallel AND each slot's point
    buffer sharded across the ray axis (GSPMD inserts the cross-shard
    gather collectives)."""
    from loner_tpu.parallel.mesh import make_mesh_2d

    field_cfg, buffers, runner, w = _setup()
    losses_1, twists_1, params_1 = _run(runner, field_cfg, buffers, w, mesh=None)
    mesh = make_mesh_2d(4, 2)
    losses_2d, twists_2d, params_2d = _run(runner, field_cfg, buffers, w, mesh=mesh)

    np.testing.assert_allclose(losses_2d, losses_1, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(twists_2d, twists_1, rtol=2e-4, atol=1e-7)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-6),
        params_1,
        params_2d,
    )


def test_optimizer_class_under_mesh_matches_single_device():
    """The production Optimizer with mesh= must compute the same
    optimization as single-device (GSPMD sharding is numerically a no-op
    modulo float reduction order)."""
    from loner_tpu.mapping.optimizer import Optimizer

    from test_mapping import make_keyframes, small_field_cfg, small_opt_cfg

    schedule = [
        {
            "num_keyframes": -1,
            "iteration_schedule": [
                {"num_iterations": 6, "freeze_poses": False,
                 "freeze_sigma_mlp": False}
            ],
        }
    ]

    def build(mesh):
        return Optimizer(
            small_opt_cfg(
                samples_strategy="PROPOSAL", prop_n_ctrl=17,
                steps_per_dispatch=3, window_size=4,
            ),
            small_field_cfg(),
            cube.scale_factor,
            cube.shift,
            schedule,
            seed=5,
            mesh=mesh,
        )

    kfs_a, cube, _, _ = make_keyframes(3)
    kfs_b, _, _, _ = make_keyframes(3)  # independent copies (poses mutate)

    opt_a = build(None)
    opt_b = build(make_mesh(4))

    # m=2 window: both paths run the full window width (the bootstrap
    # width-1 class applies only off-mesh), so RNG streams are identical.
    opt_a.iterate_optimizer(kfs_a[:2])
    opt_b.iterate_optimizer(kfs_b[:2])

    # Element-wise param equality is NOT a usable check here: the hash
    # table's backward is a scatter-add whose accumulation order differs
    # under GSPMD, and Adam's 1/sqrt(v) normalization amplifies that
    # float noise on rarely-hit entries. Behavioral outputs (losses,
    # optimized poses) are averaged over thousands of samples and are the
    # parity that matters.
    for ka, kb in zip(kfs_a[:2], kfs_b[:2]):
        np.testing.assert_allclose(
            ka.pose_twist(), kb.pose_twist(), rtol=1e-3, atol=1e-4
        )
    np.testing.assert_allclose(
        opt_a.last_losses, opt_b.last_losses, rtol=2e-3, atol=2e-4
    )


def test_mapper_builds_2axis_mesh_from_config():
    """system.mesh_devices: [kf, ray] reaches the production Optimizer as
    a 2-axis mesh (slot axis x per-slot point axis)."""
    from loner_tpu.common.settings import Settings
    from loner_tpu.common.signals import Signal
    from loner_tpu.common.world_cube import WorldCube
    from loner_tpu.mapping.mapper import Mapper

    s = Settings.load_from_file("cfg/defaults.yaml")
    s.augment(
        {
            "mapper": {
                "mesh_devices": [4, 2],
                "keyframe_manager": {"window_selection": {"window_size": 4}},
                "optimizer": {
                    "samples_selection": {"strategy": "PROPOSAL"},
                    "num_samples": {"lidar": 16, "sky": 0},
                    "model_config": {
                        "model": {"render": {"N_samples_train": 8, "N_samples_test": 8}}
                    },
                },
            }
        }
    )
    s["mapper"]["lidar_only"] = True
    s["mapper"]["debug"] = s.debug  # Loner.start normally injects this
    cube = WorldCube(scale_factor=10.0, shift=np.zeros(3))
    mapper = Mapper(
        s.mapper, Signal(single_process=True), Signal(single_process=True), cube
    )
    mesh = mapper.optimizer._mesh
    assert mesh is not None
    assert mesh.axis_names == ("data", "ray")
    assert mesh.devices.shape == (4, 2)
