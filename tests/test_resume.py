"""Mid-run SLAM resume (runtime/resume.py).

The reference cannot do this — its checkpoints only feed the offline
analysis tools (src/mapping/mapper.py:161-175; nothing reloads them into
a live run). Here an interrupted run's final checkpoint + the dataset
fully determine the continuation: keyframes rebuild from re-read scans,
motion compensation replays from tracking_only.txt, the tracker chain
re-seeds from the last keyframe's tracked pose, and the logger reloads
its trajectory accumulators.
"""
import copy
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

from loner_tpu.analysis.traj_metrics import evaluate_trajectory_files
from loner_tpu.common.trajectory import load_tum_trajectory
from loner_tpu.mapping.mapper import load_checkpoint

from test_e2e_slam import NUM_SCANS, synthetic_dataset, tiny_settings  # noqa: F401

# Suite tier (tests/conftest.py): full-pipeline drive, >30 s on CPU.
pytestmark = [pytest.mark.slow, pytest.mark.e2e]


@pytest.fixture(scope="module")
def resumed_run(synthetic_dataset, tmp_path_factory):  # noqa: F811
    from run_loner import run_trial

    log_prefix = str(tmp_path_factory.mktemp("outputs_resume"))
    settings = tiny_settings(log_prefix)

    # Phase 1: interrupt the run roughly halfway through the sequence
    # (duration gates the ingest loop; stop() still writes final.tar).
    half = run_trial(
        copy.deepcopy(settings),
        synthetic_dataset,
        experiment_name="resume_half",
        duration=2.1,
    )
    half_ckpt = load_checkpoint(os.path.join(half, "checkpoints", "final.tar"))
    half_track = load_tum_trajectory(
        os.path.join(half, "trajectory", "tracking_only.txt")
    )

    # Phase 2: resume the same directory and stream the remainder.
    resumed = run_trial(
        copy.deepcopy(settings),
        synthetic_dataset,
        resume_from=half,
    )
    assert resumed == half  # continues in place

    from loner_tpu.datasets.scan_stream import ScanStreamReader

    reader = ScanStreamReader(synthetic_dataset)
    span = (
        reader.read_scan(0).get_start_time(),
        reader.read_scan(len(reader) - 1).get_start_time(),
    )
    return {
        "log_dir": resumed,
        "half_kfs": len(half_ckpt["poses"]),
        "half_frames": len(half_track[1]),
        "scan_span": span,
    }


class TestResume:
    def test_keyframes_continue(self, resumed_run):
        final = load_checkpoint(
            os.path.join(resumed_run["log_dir"], "checkpoints", "final.tar")
        )
        assert len(final["poses"]) > resumed_run["half_kfs"]
        # Checkpoint numbering continued instead of restarting at 0:
        # every keyframe index up to the final count has a ckpt file.
        n = len(final["poses"])
        for k in range(n):
            assert os.path.exists(
                os.path.join(
                    resumed_run["log_dir"], "checkpoints", f"ckpt_{k}.tar"
                )
            )
        # Restored keyframes kept their identity: the first half of the
        # pose states matches what the interrupted run checkpointed
        # (timestamps are the anchor; poses continue optimizing).
        ts = [p["timestamp"] for p in final["poses"]]
        assert len(set(np.round(ts, 6))) == n  # no duplicated keyframes

    def test_trajectory_covers_full_sequence(self, resumed_run):
        _, ts = load_tum_trajectory(
            os.path.join(
                resumed_run["log_dir"], "trajectory", "estimated_trajectory.txt"
            )
        )
        # More frames than the interrupted run, no duplicate timestamps,
        # strictly increasing (the preload truncation + re-stream must
        # not double-track any frame).
        assert len(ts) > resumed_run["half_frames"] - 2
        assert np.all(np.diff(ts) > 0)
        # Spans the whole sequence: from the dataset's first scan to
        # within a frame period of its last (24 scans at 5 Hz).
        t0, t1 = resumed_run["scan_span"]
        assert abs(ts[0] - t0) < 0.3
        assert ts[-1] > t1 - 0.5

    def test_resumed_ate_matches_uninterrupted(self, resumed_run):
        res = evaluate_trajectory_files(
            os.path.join(
                resumed_run["log_dir"], "trajectory", "estimated_trajectory.txt"
            ),
            os.path.join(
                resumed_run["log_dir"], "trajectory", "groundtruth.txt"
            ),
            delta_m=1.0,
        )
        # Same threshold as the uninterrupted e2e run
        # (test_e2e_slam.TestEndToEnd.test_trajectory_ate).
        assert res["ate"]["rmse"] < 0.15, res["ate"]

    def test_tracking_only_continuous(self, resumed_run):
        poses, ts = load_tum_trajectory(
            os.path.join(
                resumed_run["log_dir"], "trajectory", "tracking_only.txt"
            )
        )
        assert np.all(np.diff(ts) > 0)
        # No teleport at the resume seam: the synthetic loop moves at
        # constant speed, so every frame-to-frame translation — the seam
        # included — must stay near the median step.
        deltas = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=1)
        med = np.median(deltas)
        assert np.all(np.abs(deltas - med) < 0.25 * med), deltas


class TestCameraResume:
    def test_rebuilt_keyframes_carry_images(self, tmp_path_factory):
        """Camera mode: resume re-matches each keyframe's image from the
        dataset (frame-synthesis tolerance semantics) so the intensity
        supervision survives the restart."""
        from run_loner import run_trial
        from test_e2e_camera import camera_settings
        from test_e2e_slam import NUM_SCANS as N  # noqa: F401
        from loner_tpu.common.pose import Pose as _Pose
        from loner_tpu.datasets.scan_stream import (
            ScanStreamReader,
            ScanStreamWriter,
        )
        from loner_tpu.datasets.synthetic import VirtualLidar, generate_sequence
        from test_e2e_camera import CAM

        root = str(tmp_path_factory.mktemp("ds_cam_res"))
        # 24 scans like test_e2e_camera: the synthetic loop spans a fixed
        # arc, so fewer scans would double the per-frame motion past the
        # ICP envelope.
        scans, poses, ts, scene, _ = generate_sequence(
            num_scans=24,
            lidar=VirtualLidar(num_channels=16, num_columns=128, max_range=30.0),
            rate_hz=5.0,
        )
        w = ScanStreamWriter(root)
        for i, s in enumerate(scans):
            w.add_scan(s)
            w.add_image(CAM.render(scene, _Pose(poses[i])), s.get_start_time())
        w.write_gt(poses, ts)

        settings = camera_settings(str(tmp_path_factory.mktemp("out_cam_res")))
        half = run_trial(
            copy.deepcopy(settings), root, experiment_name="cam_half",
            duration=2.1,
        )

        # Drive the restore directly (run_trial minus streaming) so the
        # rebuilt keyframes can be inspected before any new frames land.
        import numpy as _np

        from loner_tpu.runtime.loner import Loner
        from loner_tpu.runtime.resume import resume_run

        s2 = copy.deepcopy(settings)
        reader = ScanStreamReader(root)
        gt = reader.gt_poses()
        gt_zeroed = _np.linalg.inv(gt[0])[None] @ gt
        loner = Loner(s2)
        loner.initialize(
            None, gt_zeroed, None,
            s2.mapper.optimizer.model_config.data.ray_range,
            dataset_path=root, log_directory=half,
        )
        loner.start()
        idx = resume_run(loner, reader, half)
        kfs = loner._mapper.keyframe_manager.get_keyframes()
        assert len(kfs) >= 2
        assert idx > 0
        for kf in kfs:
            assert kf._frame.image is not None, kf
            assert kf._frame.image.image.size > 0
        loner.stop()


class TestFindResumeCheckpoint:
    def test_skips_poses_only_and_prefers_latest(self, tmp_path):
        import pickle

        ckpt_dir = tmp_path / "checkpoints"
        ckpt_dir.mkdir()
        full = {
            "global_step": 10,
            "network_state_dict": {"w": np.zeros(2)},
            "poses": [{"timestamp": 0.0}],
        }
        poses_only = {"global_step": 12, "poses": [{"timestamp": 0.0}]}
        with open(ckpt_dir / "ckpt_0.tar", "wb") as f:
            pickle.dump(full, f)
        with open(ckpt_dir / "ckpt_1.tar", "wb") as f:
            pickle.dump(poses_only, f)

        from loner_tpu.runtime.resume import find_resume_checkpoint

        ckpt, path = find_resume_checkpoint(str(tmp_path))
        assert path.endswith("ckpt_0.tar")  # newest FULL one

        with open(ckpt_dir / "final.tar", "wb") as f:
            pickle.dump({**full, "global_step": 20}, f)
        ckpt, path = find_resume_checkpoint(str(tmp_path))
        assert path.endswith("final.tar")
        assert ckpt["global_step"] == 20


class TestRebuildFidelity:
    """The resume rebuild must reproduce the LIVE keyframes' scan data.

    Regression for the round-3 SE(3) manifold-drift bug, whose first
    symptom was exactly this divergence: live keyframe scans (warped by
    scale-inflated pose chains at motion-compensation time) drifted up
    to 0.9 m from the checkpoint-faithful rebuild. Post-fix the two
    paths must agree to float noise — any future live-path state that
    is not derivable from {checkpoint, dataset, tracking_only.txt}
    shows up here."""

    def test_live_keyframes_match_rebuild(self, synthetic_dataset, tmp_path_factory):  # noqa: F811
        import copy

        import numpy as np
        from run_loner import run_trial

        from loner_tpu.common.trajectory import load_tum_trajectory
        from loner_tpu.datasets.scan_stream import ScanStreamReader
        from loner_tpu.mapping import mapper as mapper_mod
        from loner_tpu.runtime.resume import rebuild_keyframe_frames

        stash = {}
        orig = mapper_mod.Mapper.finish

        def spy(self):
            stash["mgr"] = self._keyframe_manager
            return orig(self)

        mapper_mod.Mapper.finish = spy
        try:
            log_prefix = str(tmp_path_factory.mktemp("outputs_fidelity"))
            settings = tiny_settings(log_prefix)
            logdir = run_trial(
                copy.deepcopy(settings), synthetic_dataset,
                experiment_name="fidelity",
            )
        finally:
            mapper_mod.Mapper.finish = orig

        kfs = stash["mgr"].get_keyframes()
        ckpt = load_checkpoint(os.path.join(logdir, "checkpoints", "final.tar"))
        track_poses, track_ts = load_tum_trajectory(
            os.path.join(logdir, "trajectory", "tracking_only.txt")
        )
        reader = ScanStreamReader(synthetic_dataset)
        frames = rebuild_keyframe_frames(
            reader, settings, ckpt["poses"],
            kfs[0]._frame._lidar_to_camera, track_poses, track_ts,
        )
        assert len(frames) == len(kfs)
        for i, (kf, f) in enumerate(zip(kfs, frames)):
            a = np.asarray(kf._frame.lidar_points.distances)
            b = np.asarray(f.lidar_points.distances)
            assert a.shape == b.shape, f"kf{i} point count"
            d = float(np.abs(a - b).max())
            assert d < 1e-3, f"kf{i}: live vs rebuilt depths differ by {d}"

        # The tracking seed must use the UNCOMPENSATED scan: the live
        # tracker builds each reference cloud at frame arrival, before
        # _apply_registration motion-compensates the scan in place —
        # seeding from the rebuilt (compensated) keyframe scan would
        # register the first post-resume frame against shifted points.
        from loner_tpu.runtime.resume import (
            _match_scan_index,
            _read_processed_scan,
            build_seed_frame,
        )

        seed = build_seed_frame(reader, settings, ckpt["poses"], frames)
        last_idx = _match_scan_index(
            reader.time_spans(), float(ckpt["poses"][-1]["timestamp"])
        )
        raw = _read_processed_scan(reader, last_idx, settings)
        # Non-vacuousness: compensation must actually have moved points
        # on this dataset, else compensated-vs-raw is indistinguishable.
        comp = np.asarray(frames[-1].lidar_points.ray_directions)
        assert np.abs(comp - np.asarray(raw.ray_directions)).max() > 1e-6, (
            "fixture broken: motion compensation was a no-op"
        )
        np.testing.assert_array_equal(
            np.asarray(seed.lidar_points.ray_directions),
            np.asarray(raw.ray_directions),
        )
        np.testing.assert_array_equal(
            np.asarray(seed.lidar_points.distances),
            np.asarray(raw.distances),
        )
        # Same sweep time and pose as the rebuilt keyframe.
        assert seed.get_time() == frames[-1].get_time()


class TestScanMatching:
    """Keyframe-to-scan matching must survive FOV masking: checkpointed
    keyframe timestamps are the MASKED scan's first timestamp, which sits
    strictly inside the raw sweep whenever the FOV range trims the
    sweep-start azimuth (the spinning-lidar model is column-major in
    time). Exact raw-start comparison (the pre-fix code) hard-fails
    there; interval containment is mask-proof."""

    def test_match_scan_index_interval_containment(self):
        from loner_tpu.runtime.resume import _match_scan_index

        spans = np.array([[0.0, 0.09], [0.1, 0.19], [0.2, 0.29]])
        assert _match_scan_index(spans, 0.1) == 1      # raw start
        assert _match_scan_index(spans, 0.145) == 1    # masked start, mid-sweep
        assert _match_scan_index(spans, 0.29) == 2     # sweep end
        with pytest.raises(ValueError, match="wrong dataset"):
            _match_scan_index(spans, 0.5)
        with pytest.raises(ValueError, match="wrong dataset"):
            _match_scan_index(spans, -0.1)

    def test_rebuild_with_fov_mask(self, synthetic_dataset, tmp_path_factory):  # noqa: F811
        """Full-chain regression: SLAM with an FOV range that trims the
        sweep start, then rebuild the keyframes from the checkpoint —
        matching must succeed and the rebuilt scans must be the live
        (masked, motion-compensated) ones."""
        from run_loner import run_trial

        from loner_tpu.datasets.scan_stream import ScanStreamReader
        from loner_tpu.mapping import mapper as mapper_mod
        from loner_tpu.runtime.resume import rebuild_keyframe_frames

        stash = {}
        orig = mapper_mod.Mapper.finish

        def spy(self):
            stash["mgr"] = self._keyframe_manager
            return orig(self)

        mapper_mod.Mapper.finish = spy
        try:
            log_prefix = str(tmp_path_factory.mktemp("outputs_fov"))
            settings = tiny_settings(log_prefix)
            settings.augment(
                {"system": {"lidar_fov": {"enabled": True, "range": [[30, 330]]}}}
            )
            logdir = run_trial(
                copy.deepcopy(settings), synthetic_dataset,
                experiment_name="fov_fidelity",
            )
        finally:
            mapper_mod.Mapper.finish = orig

        kfs = stash["mgr"].get_keyframes()
        ckpt = load_checkpoint(os.path.join(logdir, "checkpoints", "final.tar"))
        track_poses, track_ts = load_tum_trajectory(
            os.path.join(logdir, "trajectory", "tracking_only.txt")
        )
        reader = ScanStreamReader(synthetic_dataset)

        # The premise of the regression: masked keyframe start times must
        # NOT coincide with raw scan starts (else this test is vacuous).
        raw_starts = reader.start_times()
        kf_times = [float(s["timestamp"]) for s in ckpt["poses"]]
        assert all(
            np.abs(raw_starts - t).min() > 1e-3 for t in kf_times
        ), "FOV mask did not shift keyframe timestamps — fixture broken"

        frames = rebuild_keyframe_frames(
            reader, settings, ckpt["poses"],
            kfs[0]._frame._lidar_to_camera, track_poses, track_ts,
        )
        assert len(frames) == len(kfs)
        for i, (kf, f) in enumerate(zip(kfs, frames)):
            a = np.asarray(kf._frame.lidar_points.distances)
            b = np.asarray(f.lidar_points.distances)
            assert a.shape == b.shape, f"kf{i} point count"
            d = float(np.abs(a - b).max())
            assert d < 1e-3, f"kf{i}: live vs rebuilt depths differ by {d}"
