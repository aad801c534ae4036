"""On-disk scan-stream dataset: the rosbag replacement.

The reference ingests ROS bags with the C++ rosbag stack and decodes
PointCloud2 messages per scan (reference: examples/run_loner.py:59-157,
281-328). This framework's canonical on-disk format is a directory of
npz scans + a TUM ground-truth trajectory:

    <dataset>/
      meta.yaml                # sensor metadata (optional)
      scans/scan_000000.npz    # directions (3,N) f32, distances (N,) f32,
      scans/scan_000001.npz    #   timestamps (N,) f64 (sorted)
      ...
      poses_gt.tum             # optional GT trajectory (TUM format)

``normalize_timestamps`` reproduces the reference's ingest heuristics
(run_loner.py:103-157): ns -> s conversion, per-scan-relative stamps
shifted to global time, and sort-by-time enforcement.
"""
from __future__ import annotations

import os
from typing import Iterator, List, Optional, Tuple

import numpy as np
import yaml

from loner_tpu.common.pose import Pose
from loner_tpu.common.sensors import LidarScan
from loner_tpu.common.trajectory import TrajectoryInterpolator, load_tum_trajectory


def normalize_timestamps(
    timestamps: np.ndarray,
    scan_time: float,
    relative_to_start: bool = True,
) -> np.ndarray:
    """Apply the reference's per-point timestamp heuristics
    (examples/run_loner.py:113-147), in the same order:

    1. nanosecond stamps (epoch-ns magnitude, or a > 1e6 s spread no
       second-valued per-scan stamps could have) scale to seconds
    2. ts[0] < -1e-3 -> negative offsets (velodyne), rebase to ts[0]
    3. scan-local offsets shift by the scan header time; global stamps
       re-anchor to the header time
    4. spread < 1e-3 -> stamps are degenerate (no real per-point time);
       fill with the header time (motion compensation becomes a no-op)

    Output is float64 seconds, globally referenced. ``relative_to_start``
    (reference CLI default) treats any small-magnitude stamp array as
    scan-local even when the first KEPT point starts later than the
    reference's 10 ms threshold — range filtering runs before this
    function, unlike the reference's pre-filter indexing.
    """
    ts = np.asarray(timestamps, dtype=np.float64)
    if ts.size == 0:
        return ts
    # Nanosecond detection: the reference's bare |ts| > 1e7 test
    # (run_loner.py:121) also catches absolute EPOCH-SECOND stamps
    # (~1.7e9) and destroys their sub-second offsets; require either an
    # unambiguous magnitude (epoch-ns ~1e18) or a spread no realistic
    # per-scan second-valued stamps could have (> 1e6 s).
    if np.abs(ts).max() > 1e14 or ts.max() - ts.min() > 1e6:
        ts = ts * 1e-9
    if ts[0] < -1e-3:  # velodyne negative offsets (run_loner.py:126)
        ts = ts - ts[0]
    if ts[0] < 1e-2 or (relative_to_start and ts.max() < 1e5):
        # Scan-local offsets (run_loner.py:131-133). The relative_to_start
        # arm also anchors scans whose FIRST KEPT point starts later than
        # 10 ms into the sweep (range filtering runs before this, so
        # ts[0] is not column 0 like the reference's pre-filter array).
        ts = ts + scan_time
    elif ts.max() > 1e5:
        ts = ts - ts[0] + scan_time  # global (run_loner.py:134-137)
    if ts.size > 1 and ts.max() - ts.min() < 1e-3:
        # Degenerate stamps: no usable per-point time (run_loner.py:141-146)
        ts = np.full_like(ts, scan_time)
    return ts


def recompute_scan_timestamps(
    point_indices: np.ndarray, h_resolution: int = 2048, scan_period: float = 0.1
) -> np.ndarray:
    """Fusion Portable timestamp fix (reference run_loner.py:103-108):
    reconstruct per-point scan-local times from each point's pre-filter
    column index (``point_indices``) for bags whose stored stamps are
    wrong."""
    idx = np.asarray(point_indices, dtype=np.float64)
    return (idx % h_resolution) / h_resolution * scan_period


class ScanStreamWriter:
    def __init__(self, root: str, meta: Optional[dict] = None) -> None:
        self._root = root
        os.makedirs(os.path.join(root, "scans"), exist_ok=True)
        self._count = 0
        if meta:
            with open(os.path.join(root, "meta.yaml"), "w") as f:
                yaml.safe_dump(meta, f)

    def add_scan(self, scan: LidarScan) -> None:
        path = os.path.join(self._root, "scans", f"scan_{self._count:06d}.npz")
        np.savez_compressed(
            path,
            directions=scan.ray_directions,
            distances=scan.distances,
            timestamps=scan.timestamps,
        )
        self._count += 1

    def add_image(self, image: np.ndarray, timestamp: float) -> None:
        """Camera frame for the intensity-supervision path; (H, W, C)
        float in [0, 1]. Images are optional — a lidar-only stream simply
        never calls this."""
        img_dir = os.path.join(self._root, "images")
        os.makedirs(img_dir, exist_ok=True)
        n = len([f for f in os.listdir(img_dir) if f.endswith(".npz")])
        np.savez_compressed(
            os.path.join(img_dir, f"image_{n:06d}.npz"),
            image=np.asarray(image, np.float32),
            timestamp=np.float64(timestamp),
        )

    def write_gt(self, poses: np.ndarray, timestamps: np.ndarray) -> None:
        from loner_tpu.common.trajectory import dump_trajectory_to_tum

        dump_trajectory_to_tum(poses, timestamps, os.path.join(self._root, "poses_gt.tum"))


class ScanStreamReader:
    """Iterates (LidarScan, Optional[Pose gt]) in time order."""

    def __init__(self, root: str) -> None:
        self._root = root
        scan_dir = os.path.join(root, "scans")
        self._scan_files = sorted(
            os.path.join(scan_dir, f) for f in os.listdir(scan_dir) if f.endswith(".npz")
        )
        gt_path = os.path.join(root, "poses_gt.tum")
        self._gt: Optional[TrajectoryInterpolator] = None
        if os.path.exists(gt_path):
            poses, ts = load_tum_trajectory(gt_path)
            self._gt = TrajectoryInterpolator(poses, ts)
        meta_path = os.path.join(root, "meta.yaml")
        self.meta = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                self.meta = yaml.safe_load(f) or {}
        self._time_spans: Optional[np.ndarray] = None
        self._image_files: Optional[List[str]] = None

    def __len__(self) -> int:
        return len(self._scan_files)

    @property
    def gt_interpolator(self) -> Optional[TrajectoryInterpolator]:
        return self._gt

    def gt_poses(self) -> Optional[np.ndarray]:
        if self._gt is None:
            return None
        return self._gt._poses

    def read_scan(self, idx: int) -> LidarScan:
        data = np.load(self._scan_files[idx])
        return LidarScan(data["directions"], data["distances"], data["timestamps"])

    def time_spans(self) -> np.ndarray:
        """(len(self), 2) raw [start, end] time per scan, reading only each
        npz's timestamps member, cached after the first call (resume
        keyframe lookup, runtime/resume.py)."""
        if self._time_spans is None:
            spans = []
            for f in self._scan_files:
                ts = np.load(f)["timestamps"]
                spans.append((float(ts[0]), float(ts[-1])))
            self._time_spans = np.asarray(spans)
        return self._time_spans

    def start_times(self) -> np.ndarray:
        """(len(self),) scan start times (cached; see time_spans)."""
        return self.time_spans()[:, 0]

    def image_files(self) -> List[str]:
        if self._image_files is None:
            img_dir = os.path.join(self._root, "images")
            if not os.path.isdir(img_dir):
                self._image_files = []
            else:
                self._image_files = sorted(
                    os.path.join(img_dir, f)
                    for f in os.listdir(img_dir)
                    if f.endswith(".npz")
                )
        return self._image_files

    def read_image(self, idx: int):
        """(image (H, W, C) float32, timestamp float)."""
        data = np.load(self.image_files()[idx])
        return data["image"], float(data["timestamp"])

    def read_image_timestamp(self, idx: int) -> float:
        """Timestamp alone, without decoding the pixel array."""
        return float(np.load(self.image_files()[idx])["timestamp"])

    def __iter__(self) -> Iterator[Tuple[LidarScan, Optional[Pose]]]:
        for i in range(len(self)):
            scan = self.read_scan(i)
            gt = None
            if self._gt is not None and self._gt.contains(scan.get_start_time()):
                gt = self._gt.at(scan.get_start_time())
            yield scan, gt


def apply_fov_mask(scan: LidarScan, fov_ranges_deg: List[List[float]]) -> LidarScan:
    """Keep only rays whose azimuth falls in the given degree ranges
    (reference run_loner.py lidar_fov filter, cfg/defaults.yaml:124-126)."""
    azim = np.rad2deg(
        np.arctan2(scan.ray_directions[1], scan.ray_directions[0])
    ) % 360.0
    keep = np.zeros(len(scan), dtype=bool)
    for lo, hi in fov_ranges_deg:
        keep |= (azim >= lo) & (azim <= hi)
    return LidarScan(
        scan.ray_directions[:, keep], scan.distances[keep], scan.timestamps[keep]
    )


def apply_min_range(scan: LidarScan, min_range: float) -> LidarScan:
    keep = scan.distances > min_range
    return LidarScan(
        scan.ray_directions[:, keep], scan.distances[keep], scan.timestamps[keep]
    )
