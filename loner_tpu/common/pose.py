"""Host-side Pose type.

TPU-native counterpart of the reference's differentiable ``Pose``
(reference: src/common/pose.py:23-166). The key architectural difference:
in this framework poses that participate in optimization live as rows of a
``(K, 6)`` twist array inside the jitted train step (a pure function of
``PoseState``), so the host-side ``Pose`` is a plain immutable value type —
no ``requires_grad`` toggles, no hidden matrix regeneration. Conversions go
through :mod:`loner_tpu.common.se3` (same [t, axis-angle] convention).
"""
from __future__ import annotations

from typing import Optional, Union

import numpy as np
from scipy.spatial.transform import Rotation as _R


class Pose:
    """Immutable rigid transform, stored as a 4x4 float64 numpy matrix."""

    __slots__ = ("_matrix",)

    def __init__(self, matrix: Optional[np.ndarray] = None):
        if matrix is None:
            matrix = np.eye(4)
        matrix = np.asarray(matrix, dtype=np.float64)
        assert matrix.shape == (4, 4), f"bad pose shape {matrix.shape}"
        self._matrix = matrix

    # -- constructors -------------------------------------------------------
    @staticmethod
    def identity() -> "Pose":
        return Pose(np.eye(4))

    @staticmethod
    def from_twist(twist: np.ndarray) -> "Pose":
        twist = np.asarray(twist, dtype=np.float64)
        mat = np.eye(4)
        mat[:3, :3] = _R.from_rotvec(twist[3:]).as_matrix()
        mat[:3, 3] = twist[:3]
        return Pose(mat)

    @staticmethod
    def from_settings(pose_dict: dict) -> "Pose":
        """From {xyz: [...], orientation: [x,y,z,w]} (reference pose.py:85-91).

        The reference passes its quaternion straight to
        pytorch3d.quaternion_to_axis_angle which expects [w,x,y,z]; configs
        store [0,0,0,1] (identity in xyzw). We treat the config value as
        xyzw (ROS convention), which is identical for the identity quats the
        configs actually contain.
        """
        xyz = np.asarray(pose_dict["xyz"], dtype=np.float64)
        q_xyzw = np.asarray(pose_dict["orientation"], dtype=np.float64)
        rot = _R.from_quat(q_xyzw).as_matrix()
        mat = np.eye(4)
        mat[:3, :3] = rot
        mat[:3, 3] = xyz
        return Pose(mat)

    # -- accessors -----------------------------------------------------------
    @property
    def matrix(self) -> np.ndarray:
        return self._matrix

    def get_transformation_matrix(self) -> np.ndarray:
        return self._matrix

    def get_translation(self) -> np.ndarray:
        return self._matrix[:3, 3]

    def get_rotation(self) -> np.ndarray:
        return self._matrix[:3, :3]

    def get_axis_angle(self) -> np.ndarray:
        return _R.from_matrix(self._matrix[:3, :3]).as_rotvec()

    def to_twist(self) -> np.ndarray:
        return np.concatenate([self._matrix[:3, 3], self.get_axis_angle()])

    def to_settings(self) -> dict:
        q_xyzw = _R.from_matrix(self._matrix[:3, :3]).as_quat()
        return {"xyz": self.get_translation().tolist(), "orientation": q_xyzw.tolist()}

    # -- algebra -------------------------------------------------------------
    def __mul__(self, other: "Pose") -> "Pose":
        return Pose(self._matrix @ other._matrix)

    def inv(self) -> "Pose":
        r = self._matrix[:3, :3]
        t = self._matrix[:3, 3]
        out = np.eye(4)
        out[:3, :3] = r.T
        out[:3, 3] = -r.T @ t
        return Pose(out)

    def clone(self) -> "Pose":
        return Pose(self._matrix.copy())

    def orthonormalized(self) -> "Pose":
        """Nearest SE(3) element: SVD-project the rotation block.

        Device-computed registrations are orthonormal only to f32
        round-off; a pose CHAIN that composes hundreds of them walks off
        the manifold multiplicatively (the tracker measured det drifting
        to 1.05 in under a minute before tracking/icp.py normalized its
        output). Chains must re-project after composing."""
        u, _, vt = np.linalg.svd(self._matrix[:3, :3])
        rot = u @ vt
        if np.linalg.det(rot) < 0:
            rot = (u * np.array([1.0, 1.0, -1.0])) @ vt
        out = np.eye(4)
        out[:3, :3] = rot
        out[:3, 3] = self._matrix[:3, 3]
        return Pose(out)

    def transform_points(self, pts: np.ndarray) -> np.ndarray:
        return pts @ self._matrix[:3, :3].T + self._matrix[:3, 3]

    def distance_to(self, other: "Pose") -> tuple:
        """(translation_m, rotation_deg) between two poses."""
        rel = self.inv() * other
        d_t = float(np.linalg.norm(rel.get_translation()))
        d_r = float(np.rad2deg(np.linalg.norm(rel.get_axis_angle())))
        return d_t, d_r

    def __repr__(self) -> str:
        return f"Pose({self._matrix})"


PoseLike = Union[Pose, np.ndarray]
