"""Mid-run SLAM resume from a full checkpoint.

The reference has NO resume — its checkpoints exist only for the offline
analysis tools (SURVEY §5.4; src/mapping/mapper.py:161-175 writes them,
nothing reloads them into a live run). Here the same artifact contract
{global_step, network_state_dict, poses, occ/proposal state, world_cube}
is sufficient to continue SLAM:

- keyframes are rebuilt by re-reading their scans from the dataset at the
  checkpointed timestamps (scans are immutable inputs — storing them in
  the checkpoint would bloat it for no reason);
- motion compensation is replayed exactly from ``tracking_only.txt`` (the
  tracked-pose chain the original compensation used — the pipeline is
  deterministic, so the recorded poses ARE the original ones);
- the tracker chain re-seeds from the last keyframe's TRACKED pose, so
  post-resume ICP and the keyframe manager's re-basing behave as if the
  run never stopped;
- the logger reloads its accumulated trajectories, truncated at the last
  checkpointed keyframe (later frames were tracked but never mapped —
  they re-stream).

Restored state intentionally excludes Adam moments: the optimizer builds
a fresh Adam per schedule phase (like the reference's per-phase param
groups, src/mapping/optimizer.py:259-267), so there is nothing persistent
to restore.
"""
from __future__ import annotations

import os
import re
from typing import List, Optional, Tuple

import numpy as np

from loner_tpu.common.frame import Frame
from loner_tpu.common.pose import Pose
from loner_tpu.common.trajectory import load_tum_trajectory
from loner_tpu.datasets.scan_stream import ScanStreamReader, apply_fov_mask
from loner_tpu.mapping.mapper import load_checkpoint


def find_resume_checkpoint(log_directory: str) -> Tuple[dict, str]:
    """Locate the newest FULL checkpoint (one holding network state) in
    ``<log_directory>/checkpoints``: ``final.tar`` if present, else the
    highest-numbered full ``ckpt_<k>.tar`` (poses-only checkpoints are
    skipped — they cannot seed the map)."""
    ckpt_dir = os.path.join(log_directory, "checkpoints")
    final = os.path.join(ckpt_dir, "final.tar")
    if os.path.exists(final):
        ckpt = load_checkpoint(final)
        if "network_state_dict" in ckpt:
            return ckpt, final
    candidates = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"ckpt_(\d+)\.tar", name)
        if m:
            candidates.append((int(m.group(1)), name))
    for _, name in sorted(candidates, reverse=True):
        path = os.path.join(ckpt_dir, name)
        ckpt = load_checkpoint(path)
        if "network_state_dict" in ckpt:
            return ckpt, path
    raise FileNotFoundError(
        f"No full checkpoint (with network_state_dict) under {ckpt_dir}"
    )


def _read_processed_scan(reader, idx: int, settings):
    scan = reader.read_scan(idx)
    fov = settings.system.lidar_fov
    if fov.enabled:
        scan = apply_fov_mask(scan, fov.range)
    return scan


def _match_scan_index(spans: np.ndarray, t: float, tol: float = 1e-3) -> int:
    """Index of the scan whose raw [start, end] interval contains ``t``.

    Checkpointed keyframe timestamps are the FOV-MASKED scan's first
    timestamp (run_trial masks before tracking), which can sit anywhere
    inside the raw sweep — exact comparison against raw start times breaks
    for any FOV range that trims the sweep-start azimuth. Scans are
    disjoint in time, so interval containment is unique."""
    starts, ends = spans[:, 0], spans[:, 1]
    idx = int(np.searchsorted(starts, t + tol)) - 1
    if 0 <= idx < len(starts) and starts[idx] - tol <= t <= ends[idx] + tol:
        return idx
    raise ValueError(
        f"No scan's time span contains keyframe timestamp {t} "
        "— wrong dataset for this checkpoint?"
    )


def rebuild_keyframe_frames(
    reader: ScanStreamReader,
    settings,
    states,
    t_l2c,
    track_poses,
    track_ts,
    compute_sky_rays=None,
) -> List[Frame]:
    """Rebuild the checkpointed keyframes' Frames by re-reading their
    scans and replaying the original motion compensation from the
    tracked-pose chain (``tracking_only.txt`` contents). Shared by the
    mid-run resume path and offline state-fidelity diagnostics."""
    spans = reader.time_spans()
    gt_interp = reader.gt_interpolator
    gt0_inv = None
    if gt_interp is not None:
        gt0_inv = Pose(
            np.linalg.inv(reader.gt_poses()[0])
        )  # original run's zero-origin offset

    motion_comp = bool(settings.tracker.motion_compensation.enabled)

    # Camera mode: keyframes carry their matched image (intensity
    # supervision). Rebuild the match with frame-synthesis semantics —
    # an image whose timestamp falls inside the scan's sweep (missing
    # matches degrade gracefully: the camera buffers mask empty slots).
    image_index: List[Tuple[float, int]] = []
    if not settings.system.lidar_only:
        for i in range(len(reader.image_files())):
            image_index.append((reader.read_image_timestamp(i), i))

    kf_frames: List[Frame] = []
    last_scan_idx = -1
    for state in states:
        kf_time = float(state["timestamp"])
        idx = _match_scan_index(spans, kf_time)
        last_scan_idx = max(last_scan_idx, idx)
        scan = _read_processed_scan(reader, idx, settings)

        frame = Frame(None, scan, t_l2c)
        if gt_interp is not None and gt_interp.contains(kf_time):
            frame._gt_lidar_pose = gt0_inv * gt_interp.at(kf_time)
        if image_index:
            from loner_tpu.common.sensors import Image

            tol = float(
                settings.tracker.frame_synthesis.get("frame_match_tolerance", 0.01)
            )
            s0, s1 = scan.get_start_time(), scan.get_end_time()
            for img_ts, ii in image_index:
                if s0 - tol <= img_ts <= s1 + tol:
                    img, its = reader.read_image(ii)
                    frame.image = Image(img, its)
                    break

        # Replay the original motion compensation: the predecessor
        # TRACKED frame's pose/time come from tracking_only.txt (exactly
        # what the tracker used — _apply_registration interpolates from
        # the previous frame's pose at its scan-middle time).
        ti = int(np.argmin(np.abs(track_ts - kf_time)))
        if motion_comp and ti > 0 and abs(track_ts[ti] - kf_time) <= 1e-3:
            prev_ts = track_ts[ti - 1]
            prev_idx = _match_scan_index(spans, float(prev_ts))
            # FOV mask must match the live run — the tracker's
            # _reference_time was the MASKED predecessor's middle time.
            prev_scan = _read_processed_scan(reader, prev_idx, settings)
            prev_mid = 0.5 * (
                prev_scan.get_start_time() + prev_scan.get_end_time()
            )
            tracked = Pose.from_twist(
                np.asarray(state["tracked_pose"], np.float64)
            )
            mid = 0.5 * (scan.get_start_time() + scan.get_end_time())
            scan.motion_compensate(
                (Pose(track_poses[ti - 1]), tracked), (prev_mid, mid), tracked
            )
        if compute_sky_rays is not None:
            compute_sky_rays(frame)
        kf_frames.append(frame)
    return kf_frames


def build_seed_frame(reader, settings, states, kf_frames) -> Frame:
    """The frame that re-seeds the tracking chain. Its cloud must come
    from the UNCOMPENSATED scan: the live tracker builds each reference
    cloud at frame arrival, BEFORE _apply_registration motion-compensates
    the scan in place (tracker.py::track_frame) — kf_frames[-1] holds the
    compensated points (the mapper needs those), so re-read the raw
    processed scan for the seed. Pose/time/image come from the rebuilt
    frame."""
    seed_frame = kf_frames[-1].clone()
    last_idx = _match_scan_index(
        reader.time_spans(), float(states[-1]["timestamp"])
    )
    seed_frame.lidar_points = _read_processed_scan(reader, last_idx, settings)
    return seed_frame


def resume_run(loner, reader: ScanStreamReader, prev_log_directory: str) -> int:
    """Restore a started ``Loner`` from ``prev_log_directory``'s newest
    full checkpoint. Call AFTER ``loner.start()`` and BEFORE streaming
    (and before ``warm_up``). Returns the index of the first scan to
    stream (the one after the last checkpointed keyframe)."""
    settings = loner._settings
    ckpt, ckpt_path = find_resume_checkpoint(prev_log_directory)
    states = ckpt["poses"]
    if not states:
        raise ValueError(f"{ckpt_path} holds no keyframes to resume from")

    # The world cube must be bit-comparable: rays, poses and the field all
    # live in its normalized coordinates.
    if "world_cube" in ckpt:
        cube = ckpt["world_cube"]
        ours = loner.get_world_cube().as_dict()
        if not (
            np.allclose(cube["scale_factor"], ours["scale_factor"])
            and np.allclose(cube["shift"], ours["shift"])
        ):
            raise ValueError(
                f"World cube mismatch vs {ckpt_path}: checkpoint "
                f"{cube}, recomputed {ours} — resume requires the same "
                "dataset and world-cube settings."
            )

    track_file = os.path.join(
        prev_log_directory, "trajectory", "tracking_only.txt"
    )
    track_poses, track_ts = load_tum_trajectory(track_file)

    tracker = loner._tracker
    sky = bool(settings.tracker.get("compute_sky_rays", False))
    kf_frames = rebuild_keyframe_frames(
        reader,
        settings,
        states,
        tracker._t_lidar_to_camera,
        track_poses,
        track_ts,
        compute_sky_rays=tracker.compute_sky_rays if sky else None,
    )

    loner._mapper.restore_from_checkpoint(ckpt, kf_frames)

    # Seed tracking from the newest keyframe (its pose is the tracked
    # one after from_pose_state — see Tracker.seed_reference).
    loner._tracker.seed_reference(
        build_seed_frame(reader, settings, states, kf_frames)
    )

    if loner._logger is not None and os.path.exists(track_file):
        loner._logger.preload(
            os.path.join(prev_log_directory, "trajectory"), states
        )

    resume_time = float(states[-1]["timestamp"])
    scan_ts = reader.start_times()  # cached — time_spans was read above
    later = np.nonzero(scan_ts > resume_time + 1e-6)[0]
    return int(later[0]) if len(later) else len(reader)
