"""Tests for world-cube computation and the cube transform."""
import numpy as np

from loner_tpu.common.world_cube import WorldCube, compute_world_cube


def test_bbox_path():
    bbox = {"x": [-10, 10], "y": [-10, 10], "z": [-10, 10]}
    cube = compute_world_cube(
        None, None, None, None, ray_range=(1, 10), padding=0.1, traj_bounding_box=bbox
    )
    # bbox corners +- lidar range corners (10) -> extent 40 per axis.
    # scale = |diag| / (2 sqrt 3) * 1.1 = (40 sqrt 3) / (2 sqrt 3) * 1.1 = 22.
    assert np.isclose(cube.scale_factor, 22.0, atol=1e-6)
    np.testing.assert_allclose(cube.shift, [0, 0, 0], atol=1e-9)


def test_poses_inside_cube():
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4), (32, 1, 1))
    poses[:, :3, 3] = rng.uniform(-30, 30, size=(32, 3))
    cube = compute_world_cube(None, None, None, poses, ray_range=(1, 10), padding=0.3)
    zeroed = poses @ np.linalg.inv(poses[0])
    pts = cube.to_cube(zeroed[:, :3, 3])
    assert np.abs(pts).max() <= 1.0


def test_cube_roundtrip():
    cube = WorldCube(5.0, np.array([1.0, -2.0, 3.0]))
    pts = np.random.default_rng(1).normal(size=(10, 3))
    np.testing.assert_allclose(cube.from_cube(cube.to_cube(pts)), pts, atol=1e-12)


def test_dict_roundtrip():
    cube = WorldCube(5.0, np.array([1.0, -2.0, 3.0]))
    back = WorldCube.from_dict(cube.as_dict())
    assert back.scale_factor == cube.scale_factor
    np.testing.assert_allclose(back.shift, cube.shift)
