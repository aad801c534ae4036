"""Golden tests for the SE(3)/SO(3) math core against closed forms and scipy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from loner_tpu.common import se3
from loner_tpu.common.pose import Pose


def random_rotvecs(n, seed=0, max_angle=np.pi * 0.95):
    rng = np.random.default_rng(seed)
    axes = rng.normal(size=(n, 3))
    axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return (axes * angles).astype(np.float32)


class TestAxisAngle:
    def test_matches_scipy(self):
        aa = random_rotvecs(64)
        ours = np.asarray(se3.axis_angle_to_matrix(jnp.asarray(aa)))
        theirs = Rotation.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-5)

    def test_identity(self):
        out = np.asarray(se3.axis_angle_to_matrix(jnp.zeros(3)))
        np.testing.assert_allclose(out, np.eye(3), atol=1e-7)

    def test_small_angle_taylor(self):
        aa = np.array([1e-6, -2e-6, 1e-6], dtype=np.float32)
        ours = np.asarray(se3.axis_angle_to_matrix(jnp.asarray(aa)))
        theirs = Rotation.from_rotvec(aa).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-7)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda aa: se3.axis_angle_to_matrix(aa).sum())(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_grad_finite_generic(self):
        aa = jnp.asarray(random_rotvecs(4))
        g = jax.grad(lambda a: (se3.axis_angle_to_matrix(a) ** 2).sum())(aa)
        assert np.all(np.isfinite(np.asarray(g)))


class TestQuaternion:
    def test_matrix_to_quaternion_matches_scipy(self):
        aa = random_rotvecs(128, seed=1)
        mats = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
        ours = np.asarray(se3.matrix_to_quaternion(jnp.asarray(mats)))
        theirs = Rotation.from_matrix(mats).as_quat()  # xyzw
        theirs_wxyz = np.concatenate([theirs[:, 3:], theirs[:, :3]], axis=-1)
        # Fix sign convention (ours has w >= 0).
        theirs_wxyz *= np.where(theirs_wxyz[:, :1] < 0, -1.0, 1.0)
        np.testing.assert_allclose(ours, theirs_wxyz, atol=1e-5)

    def test_quaternion_roundtrip(self):
        aa = random_rotvecs(64, seed=2)
        mats = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
        q = se3.matrix_to_quaternion(jnp.asarray(mats))
        back = np.asarray(se3.quaternion_to_matrix(q))
        np.testing.assert_allclose(back, mats, atol=1e-5)

    def test_near_pi_rotation(self):
        aa = np.array([[np.pi - 1e-4, 0, 0], [0, np.pi - 1e-4, 0]], dtype=np.float32)
        mats = Rotation.from_rotvec(aa).as_matrix().astype(np.float32)
        out = np.asarray(se3.matrix_to_axis_angle(jnp.asarray(mats)))
        np.testing.assert_allclose(out, aa, atol=1e-3)


class TestTwist:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        twists = np.concatenate(
            [rng.normal(size=(32, 3)), random_rotvecs(32, seed=4)], axis=-1
        ).astype(np.float32)
        mats = se3.twist_to_matrix(jnp.asarray(twists))
        back = np.asarray(se3.matrix_to_twist(mats))
        np.testing.assert_allclose(back, twists, atol=1e-4)

    def test_translation_passthrough(self):
        # Convention check: translation is stored raw (not se(3) V @ rho).
        twist = jnp.asarray([1.0, 2.0, 3.0, 0.5, -0.2, 0.1])
        mat = np.asarray(se3.twist_to_matrix(twist))
        np.testing.assert_allclose(mat[:3, 3], [1.0, 2.0, 3.0], atol=1e-6)

    def test_inverse(self):
        twists = np.concatenate(
            [np.random.default_rng(5).normal(size=(8, 3)), random_rotvecs(8, seed=6)],
            axis=-1,
        ).astype(np.float32)
        mats = se3.twist_to_matrix(jnp.asarray(twists))
        inv = se3.transform_inverse(mats)
        prod = np.asarray(mats @ inv)
        np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), prod.shape), atol=1e-5)


class TestInterpolation:
    def test_endpoints(self):
        t0 = np.asarray(se3.twist_to_matrix(jnp.asarray([0, 0, 0, 0, 0, 0.3], dtype=jnp.float32)))
        t1 = np.asarray(se3.twist_to_matrix(jnp.asarray([1, 2, 3, 0, 0.4, 0.3], dtype=jnp.float32)))
        out = np.asarray(
            se3.interpolate_transforms(jnp.asarray(t0), jnp.asarray(t1), jnp.asarray([0.0, 1.0]))
        )
        np.testing.assert_allclose(out[0], t0, atol=1e-5)
        np.testing.assert_allclose(out[1], t1, atol=1e-5)

    def test_midpoint_rotation_angle(self):
        r1 = Rotation.from_rotvec([0, 0, 1.0]).as_matrix()
        t0, t1 = np.eye(4), np.eye(4)
        t1 = t1.copy()
        t1[:3, :3] = r1
        out = np.asarray(
            se3.interpolate_transforms(
                jnp.asarray(t0, dtype=jnp.float32),
                jnp.asarray(t1, dtype=jnp.float32),
                jnp.asarray([0.5]),
            )
        )
        angle = np.linalg.norm(Rotation.from_matrix(out[0, :3, :3]).as_rotvec())
        assert angle == pytest.approx(0.5, abs=1e-4)


class TestPose:
    def test_compose_inverse(self):
        p = Pose.from_twist(np.array([1, 2, 3, 0.1, 0.2, 0.3]))
        q = p * p.inv()
        np.testing.assert_allclose(q.matrix, np.eye(4), atol=1e-10)

    def test_settings_roundtrip(self):
        d = {"xyz": [1.0, -2.0, 0.5], "orientation": [0.0, 0.0, 0.7071068, 0.7071068]}
        p = Pose.from_settings(d)
        back = p.to_settings()
        np.testing.assert_allclose(back["xyz"], d["xyz"], atol=1e-6)
        np.testing.assert_allclose(np.abs(back["orientation"]), np.abs(d["orientation"]), atol=1e-6)

    def test_distance(self):
        p = Pose.identity()
        q = Pose.from_twist(np.array([3, 4, 0, 0, 0, np.pi / 2]))
        d_t, d_r = p.distance_to(q)
        assert d_t == pytest.approx(5.0, abs=1e-6)
        assert d_r == pytest.approx(90.0, abs=1e-4)
