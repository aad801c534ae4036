"""Dynamic-world robustness: a transiting actor must not corrupt the map.

The reference's real datasets (fusion_portable canteen/garden, newer
college quad) contain pedestrians walking through the lidar's field of
view; the reference has no explicit dynamic-object handling — it relies
on the multi-view consistency of the depth loss to average transients
away (a moving surface is only ever seen from one keyframe at one
place). This drill pins the same property end-to-end on the TPU-native
stack: SLAM on a box-room sequence with a `DynamicBox` pedestrian
crossing mid-sequence must (a) keep trajectory ATE comparable to the
static run's bound and (b) reconstruct the TRUE static geometry behind
the actor's transit corridor — no phantom wall where the actor passed.

The full-scale counterpart is the courtyard_actors TPU drive
(artifacts/scale_drive_r5/robustness.yaml).
"""
import os
import sys

import numpy as np
import pytest

from loner_tpu.analysis.traj_metrics import evaluate_trajectory_files
from loner_tpu.datasets.scan_stream import ScanStreamWriter
from loner_tpu.datasets.synthetic import (
    BoxRoomScene,
    DynamicBox,
    VirtualLidar,
    generate_sequence,
)

pytestmark = [pytest.mark.slow, pytest.mark.e2e]

NUM_SCANS = 24


@pytest.fixture(scope="module")
def actor_dataset(tmp_path_factory):
    """The e2e box-room loop plus a pedestrian-sized box that crosses
    the room's interior while the lidar orbits (scans ~6-18 of 24 at
    5 Hz: t 1.2 s .. 3.6 s)."""
    root = str(tmp_path_factory.mktemp("ds_actor"))
    scene = BoxRoomScene()
    scene.actors = [
        DynamicBox(
            size=np.array([0.6, 0.6, 1.8]),
            waypoints=np.array([[-4.0, -3.0, -0.8], [4.0, 3.0, -0.8]]),
            speed=3.0,
            t_start=1.2,
        )
    ]
    scans, poses, ts, scene, lidar = generate_sequence(
        num_scans=NUM_SCANS,
        scene=scene,
        lidar=VirtualLidar(num_channels=16, num_columns=128, max_range=30.0),
        rate_hz=5.0,
    )
    # The actor must actually appear in the data, else the drill is vacuous:
    # compare against the static raycast of the same poses.
    static = BoxRoomScene()
    hit_scans = 0
    for i, s in enumerate(scans):
        o = np.broadcast_to(poses[i][:3, 3], (s.ray_directions.shape[1], 3))
        d = (poses[i][:3, :3] @ s.ray_directions).T
        d_static = static.raycast(o, d)
        if np.any(np.abs(d_static - s.distances) > 0.5):
            hit_scans += 1
    assert hit_scans >= 3, f"actor never entered the FOV ({hit_scans} scans)"
    w = ScanStreamWriter(root)
    for s in scans:
        w.add_scan(s)
    w.write_gt(poses, ts)
    return root


@pytest.fixture(scope="module")
def actor_slam_run(actor_dataset, tmp_path_factory):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    from run_loner import run_trial
    from test_e2e_slam import tiny_settings

    log_prefix = str(tmp_path_factory.mktemp("outputs"))
    settings = tiny_settings(log_prefix)
    return run_trial(settings, actor_dataset, experiment_name="e2e_actor")


class TestTransitingActor:
    def test_trajectory_ate_bounded(self, actor_slam_run):
        """ICP + mapping stay locked onto the static structure: same
        bound as the static e2e run (test_e2e_slam.py::test_trajectory_ate)."""
        res = evaluate_trajectory_files(
            os.path.join(actor_slam_run, "trajectory", "estimated_trajectory.txt"),
            os.path.join(actor_slam_run, "trajectory", "groundtruth.txt"),
            delta_m=1.0,
        )
        assert res["ate"]["rmse"] < 0.2, res["ate"]

    def test_no_phantom_geometry(self, actor_slam_run):
        """Render depth through the actor's transit corridor from a late
        keyframe: the recovered surface must be the static wall, not a
        phantom pedestrian. Bound: median error < 0.5 m against the
        analytic static scene, and < 25% of corridor rays off by > 1 m
        (isolated occlusion-boundary rays are expected at this tiny
        iteration budget — the static e2e L1 test tolerates mean 3.0)."""
        from loner_tpu.analysis.render_utils import (
            kf_pose_matrices,
            load_experiment,
            render_depth_chunked,
        )

        model = load_experiment(actor_slam_run)
        mats, _ = kf_pose_matrices(model)
        origin = mats[-1][:3, 3]
        # Probe rays fanning through the room interior (the corridor the
        # actor crossed) toward the far walls.
        az = np.linspace(-np.pi, np.pi, 48, endpoint=False)
        dirs = np.stack([np.cos(az), np.sin(az), np.zeros_like(az)], axis=1)
        dirs = dirs.astype(np.float32)
        origins = np.broadcast_to(origin, dirs.shape).astype(np.float32)

        static = BoxRoomScene()
        d_true = static.raycast(origins, dirs)
        out = render_depth_chunked(
            model, origins, dirs, (0.5, 14.0), n_samples=128, ret_var=True
        )
        err = np.abs(np.asarray(out["depth"]) - d_true)
        keep = np.isfinite(d_true) & (d_true < 14.0)
        err = err[keep]
        assert np.median(err) < 0.5, (np.median(err), np.sort(err)[-5:])
        assert np.mean(err > 1.0) < 0.25, (np.mean(err > 1.0), np.sort(err)[-5:])
