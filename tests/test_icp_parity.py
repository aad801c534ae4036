"""ICP A/B parity harness: our XLA point-to-plane ICP vs an independent
scipy/numpy implementation (Open3D is not installable in this env).

SURVEY §7.3 flags ICP quality parity as the biggest accuracy risk: the
reference calls Open3D's mature registration_icp (tracker.py:205-221) with
the 2-stage 1.5 m -> 0.125 m schedule (cfg/defaults.yaml:146-160). The
oracle here shares NO code with loner_tpu.tracking.icp: scipy cKDTree
correspondences, its own PCA normals, scipy Rotation exp-map updates.

The sweep perturbs structured scans by known transforms across noise and
outlier levels and asserts (a) both implementations recover the ground
truth and (b) they agree with each other. A summary table is written to
docs/ICP_PARITY.md when RUN_ICP_PARITY_REPORT=1.
"""
import os

import numpy as np
import pytest
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation

from loner_tpu.common.pose import Pose
from loner_tpu.datasets.synthetic import BoxRoomScene, VirtualLidar, make_scan
from loner_tpu.tracking.icp import run_icp_schedule

SCHEDULE = [
    {"threshold": 1.5, "max_iterations": 10},   # reference defaults.yaml:148-153
    {"threshold": 0.125, "max_iterations": 10},
]


# ---------------------------------------------------------------------------
# Independent numpy/scipy oracle
# ---------------------------------------------------------------------------

def _oracle_normals(points: np.ndarray, k: int = 30) -> np.ndarray:
    tree = cKDTree(points)
    _, idx = tree.query(points, k=k)
    nbrs = points[idx]  # (N, k, 3)
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / k
    _, vecs = np.linalg.eigh(cov)
    n = vecs[..., 0]
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


def oracle_point_to_plane_icp(src, tgt, schedule, init=None):
    """Point-to-plane ICP with KD-tree correspondences and exp-map updates
    — structurally independent of loner_tpu.tracking.icp."""
    t_mat = np.eye(4) if init is None else init.copy()
    tree = cKDTree(tgt)
    normals = _oracle_normals(tgt)
    for stage in schedule:
        max_dist = stage["threshold"]
        for _ in range(stage["max_iterations"]):
            p = src @ t_mat[:3, :3].T + t_mat[:3, 3]
            d, j = tree.query(p)
            m = d <= max_dist
            if m.sum() < 10:
                break
            q, n = tgt[j[m]], normals[j[m]]
            pm = p[m]
            r = np.sum((pm - q) * n, axis=-1)
            jac = np.hstack([np.cross(pm, n), n])
            a = jac.T @ jac + 1e-6 * np.eye(6)
            xi = -np.linalg.solve(a, jac.T @ r)
            delta = np.eye(4)
            delta[:3, :3] = Rotation.from_rotvec(xi[:3]).as_matrix()
            delta[:3, 3] = xi[3:]
            t_mat = delta @ t_mat
    return t_mat


# ---------------------------------------------------------------------------
# Scan generation + error metrics
# ---------------------------------------------------------------------------

def _make_scan(seed: int, n: int = 2000) -> np.ndarray:
    scene = BoxRoomScene()
    lidar = VirtualLidar(num_channels=24, num_columns=128, max_range=20.0)
    rng = np.random.default_rng(seed)
    mat = np.eye(4)
    mat[:3, :3] = Rotation.from_euler("z", rng.uniform(-np.pi, np.pi)).as_matrix()
    mat[:3, 3] = rng.uniform(-1.0, 1.0, 3) * np.array([1.5, 1.5, 0.2]) + np.array(
        [0.0, 0.0, 1.0]
    )
    scan = make_scan(scene, lidar, Pose(mat), t_start=0.0)
    pts = (scan.ray_directions * scan.distances[None, :]).T  # sensor frame
    if pts.shape[0] > n:
        pts = pts[np.linspace(0, pts.shape[0] - 1, n).astype(int)]
    return pts


def _perturb(pts, rot_deg, trans_m, seed):
    rng = np.random.default_rng(seed)
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    t_gt = np.eye(4)
    t_gt[:3, :3] = Rotation.from_rotvec(np.deg2rad(rot_deg) * axis).as_matrix()
    dt = rng.normal(size=3)
    t_gt[:3, 3] = trans_m * dt / np.linalg.norm(dt)
    # src observed in the perturbed frame: applying t_gt re-aligns to tgt
    inv = np.linalg.inv(t_gt)
    return pts @ inv[:3, :3].T + inv[:3, 3], t_gt


def _errors(t_est, t_gt):
    d = np.linalg.inv(t_gt) @ t_est
    rot_err = np.rad2deg(np.linalg.norm(Rotation.from_matrix(d[:3, :3]).as_rotvec()))
    return rot_err, np.linalg.norm(d[:3, 3])


CASES = [
    # (rot_deg, trans_m, noise_std, outlier_frac)
    (3.0, 0.15, 0.0, 0.0),
    (5.0, 0.30, 0.005, 0.0),
    (3.0, 0.15, 0.02, 0.05),
]


@pytest.mark.parametrize("rot_deg,trans_m,noise,outliers", CASES)
def test_icp_parity_vs_scipy_oracle(rot_deg, trans_m, noise, outliers):
    rows = run_parity_case(rot_deg, trans_m, noise, outliers, seed=0)
    (ours_rot, ours_trans), (ref_rot, ref_trans) = rows
    # (a) both recover the ground truth
    tol_rot = 0.3 + 20.0 * noise       # deg; scales with noise floor
    tol_trans = 0.02 + 2.0 * noise     # m
    assert ours_rot < tol_rot and ours_trans < tol_trans, rows
    assert ref_rot < tol_rot and ref_trans < tol_trans, rows
    # (b) the two implementations agree at the same order of accuracy
    assert abs(ours_rot - ref_rot) < tol_rot, rows
    assert abs(ours_trans - ref_trans) < tol_trans, rows


def run_parity_case(rot_deg, trans_m, noise, outliers, seed):
    pts = _make_scan(seed)
    rng = np.random.default_rng(seed + 100)
    tgt = pts
    src, t_gt = _perturb(pts, rot_deg, trans_m, seed + 1)
    if noise > 0:
        src = src + rng.normal(0, noise, src.shape)
    if outliers > 0:
        k = int(outliers * src.shape[0])
        src[rng.choice(src.shape[0], k, replace=False)] += rng.uniform(
            -2, 2, (k, 3)
        )

    ours = run_icp_schedule(src, tgt, SCHEDULE, pad_size=2048)
    t_ours = np.asarray(ours.transformation, np.float64)
    t_ref = oracle_point_to_plane_icp(src, tgt, SCHEDULE)
    return _errors(t_ours, t_gt), _errors(t_ref, t_gt)


if __name__ == "__main__" or os.environ.get("RUN_ICP_PARITY_REPORT"):
    def _write_report():
        lines = [
            "# ICP parity: XLA point-to-plane vs scipy/numpy oracle",
            "",
            "Reference 2-stage schedule (1.5 m -> 0.125 m, 10+10 iters,",
            "cfg/defaults.yaml:146-160), structured box-room scans, known",
            "perturbations. Errors vs ground truth (rotation deg / translation m).",
            "",
            "| rot / trans / noise / outliers | ours (XLA) | oracle (scipy) |",
            "|---|---|---|",
        ]
        for case in CASES:
            for seed in range(3):
                (our_r, our_t), (ref_r, ref_t) = run_parity_case(*case, seed=seed)
                lines.append(
                    f"| {case[0]}° / {case[1]} m / σ={case[2]} / {int(case[3]*100)}% "
                    f"(seed {seed}) | {our_r:.3f}° / {our_t:.4f} m "
                    f"| {ref_r:.3f}° / {ref_t:.4f} m |"
                )
        out = os.path.join(os.path.dirname(__file__), "..", "docs", "ICP_PARITY.md")
        with open(out, "w") as f:
            f.write("\n".join(lines) + "\n")
        print("wrote", out)

    if os.environ.get("RUN_ICP_PARITY_REPORT"):
        _write_report()


class TestLargeCloudBlocking:
    """16k+ point clouds run through the row-blocked distance path
    (tracking/icp.py::_map_row_blocks) in bounded memory, with the same
    accuracy as the single-tile path."""

    def test_row_block_sizing(self):
        from loner_tpu.tracking.icp import _BLOCK_BUDGET_ELEMS, _row_block

        # Default tracker pad: single tile (the fast path).
        assert _row_block(5120, 5120) is None
        b = _row_block(16384, 16384)
        assert b is not None and 16384 % b == 0
        assert b * 16384 <= _BLOCK_BUDGET_ELEMS

    def test_16k_parity_vs_oracle(self):
        # A denser virtual lidar than _make_scan's: 64 x 512 = 32k rays,
        # strided to exactly 16384 points (the blocked regime).
        scene = BoxRoomScene()
        lidar = VirtualLidar(num_channels=64, num_columns=512, max_range=20.0)
        mat = np.eye(4)
        mat[:3, 3] = [0.5, -0.5, 1.0]
        scan = make_scan(scene, lidar, Pose(mat), t_start=0.0)
        pts = (scan.ray_directions * scan.distances[None, :]).T
        pts = pts[np.linspace(0, pts.shape[0] - 1, 16384).astype(int)]
        assert pts.shape[0] > 8192, "fixture must exercise the blocked path"
        src, t_gt = _perturb(pts, rot_deg=3.0, trans_m=0.15, seed=5)

        result = run_icp_schedule(src, pts, SCHEDULE, pad_size=16384)
        ours_rot, ours_trans = _errors(
            np.asarray(result.transformation, np.float64), t_gt
        )
        assert ours_rot < 0.3 and ours_trans < 0.02, (ours_rot, ours_trans)

        t_ref = oracle_point_to_plane_icp(src, pts, SCHEDULE)
        ref_rot, ref_trans = _errors(t_ref, t_gt)
        # Same order of accuracy as the KD-tree oracle.
        assert ours_rot < max(2.0 * ref_rot, 0.1) + 0.05
        assert ours_trans < max(2.0 * ref_trans, 0.005) + 0.005


class TestSE3Projection:
    """Pose chains must stay on the SE(3) manifold.

    Device-computed registrations are orthonormal only to f32 round-off;
    composing one per frame for a whole run inflates the rotation block
    multiplicatively. Measured on chip BEFORE the fix: the tracker's pose
    determinant drifted to 1.05 within 45 s and the (scaled) rotations
    warped motion-compensated keyframe scans by 0.5+ m, costing 2.5x ATE
    (the mid-run-resume runs were immune because the checkpoint's
    twist/TUM roundtrips re-orthonormalize — that asymmetry was the
    original symptom)."""

    def test_orthonormalize_transform(self):
        from loner_tpu.tracking.icp import orthonormalize_transform
        import jax.numpy as jnp

        rot = Rotation.from_rotvec([0.1, -0.2, 0.3]).as_matrix()
        t = np.eye(4, dtype=np.float32)
        t[:3, :3] = rot * 1.01  # 1% scale inflation
        t[:3, 3] = [1.0, 2.0, 3.0]
        out = np.asarray(orthonormalize_transform(jnp.asarray(t)))
        assert np.allclose(out[:3, :3] @ out[:3, :3].T, np.eye(3), atol=1e-5)
        assert np.linalg.det(out[:3, :3]) == pytest.approx(1.0, abs=1e-5)
        assert np.allclose(out[:3, :3], rot, atol=1e-5)  # direction kept
        assert np.allclose(out[:3, 3], t[:3, 3])  # translation kept

    def test_pose_orthonormalized(self):
        rot = Rotation.from_rotvec([0.3, 0.1, -0.4]).as_matrix()
        m = np.eye(4)
        m[:3, :3] = rot * 1.02
        m[:3, 3] = [0.5, -1.0, 2.0]
        p = Pose(m).orthonormalized()
        r = p.matrix[:3, :3]
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-12)
        assert np.allclose(r, rot, atol=1e-12)
        assert np.allclose(p.matrix[:3, 3], m[:3, 3])

    def test_chain_of_inflated_registrations_stays_rigid(self):
        """300 compositions of 1.0001-scaled registrations (a minute of
        5 Hz tracking at the measured on-chip inflation) stay det=1 when
        each composition re-projects, mirroring _apply_registration."""
        rng = np.random.default_rng(0)
        chain = Pose.identity()
        for _ in range(300):
            reg = np.eye(4)
            reg[:3, :3] = Rotation.from_rotvec(rng.normal(0, 0.01, 3)).as_matrix() * 1.0001
            reg[:3, 3] = rng.normal(0, 0.01, 3)
            chain = Pose(chain.matrix @ reg).orthonormalized()
        r = chain.matrix[:3, :3]
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-9)
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-9)

    def test_icp_schedule_returns_orthonormal(self):
        scene = BoxRoomScene()
        lidar = VirtualLidar(num_channels=16, num_columns=96, max_range=30.0)
        base = np.eye(4)
        base[:3, 3] = [0.0, 0.0, 1.0]
        gt = Pose.from_twist(np.array([0.05, -0.02, 0.01, 0.004, -0.003, 0.02]))

        def pts(pose):
            s = make_scan(scene, lidar, pose, t_start=0.0)
            return (s.ray_directions * s.distances[None, :]).T

        tgt = pts(Pose(base))
        src = pts(Pose(base) * gt)
        result = run_icp_schedule(src, tgt, SCHEDULE, pad_size=2048)
        t = np.asarray(result.transformation, np.float64)
        s = np.linalg.svd(t[:3, :3], compute_uv=False)
        assert np.allclose(s, 1.0, atol=1e-5), s


class TestNonPow2Blocking:
    """Row blocking must not degrade for non-power-of-two pad sizes: a
    10000-point budget's largest pow2 DIVISOR is 16 (625 sequential
    micro-blocks inside the tracking loop) — the block is now sized to
    the budget and the ragged tail padded instead."""

    def test_row_block_is_large_for_non_pow2(self):
        from loner_tpu.tracking.icp import _row_block

        b = _row_block(10000, 10000)
        assert b is not None and b >= 2048

    def test_map_row_blocks_parity_non_pow2(self):
        import jax.numpy as jnp

        from loner_tpu.tracking import icp as icp_mod

        rng = np.random.default_rng(11)
        rows = jnp.asarray(rng.normal(size=(10000, 3)), jnp.float32)
        tgt = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)

        def fn(r):
            d = icp_mod._pairwise_sqdist(r, tgt)
            return {"min": jnp.min(d, axis=1), "arg": jnp.argmin(d, axis=1)}

        direct = fn(rows)
        # Force the blocked path regardless of the budget constants.
        old_single = icp_mod._SINGLE_TILE_ELEMS
        old_budget = icp_mod._BLOCK_BUDGET_ELEMS
        icp_mod._SINGLE_TILE_ELEMS = 1 << 18
        icp_mod._BLOCK_BUDGET_ELEMS = 1 << 17
        try:
            blocked = icp_mod._map_row_blocks(fn, rows, tgt.shape[0])
        finally:
            icp_mod._SINGLE_TILE_ELEMS = old_single
            icp_mod._BLOCK_BUDGET_ELEMS = old_budget
        np.testing.assert_allclose(
            np.asarray(blocked["min"]), np.asarray(direct["min"]),
            rtol=1e-5, atol=1e-6,  # XLA fuses the two paths differently
        )
        np.testing.assert_array_equal(
            np.asarray(blocked["arg"]), np.asarray(direct["arg"])
        )
