"""FrameSynthesis: turn sensor streams into Frames.

TPU-native counterpart of the reference (src/tracking/frame_synthesis.py:
23-140): lidar-only path decimates the scan stream to the configured frame
rate; the camera path matches images to scans by timestamp tolerance.
"""
from __future__ import annotations

from typing import List, Optional, Tuple

from loner_tpu.common.frame import Frame
from loner_tpu.common.pose import Pose
from loner_tpu.common.sensors import Image, LidarScan


class FrameSynthesis:
    def __init__(self, settings, t_lidar_to_camera: Optional[Pose], lidar_only: bool = True) -> None:
        self._settings = settings
        self._t_lidar_to_camera = t_lidar_to_camera
        self._lidar_only = lidar_only
        self._completed_frames: List[Frame] = []
        self._in_progress_frames: List[Frame] = []
        self._lidar_scans: List[Tuple[LidarScan, Optional[Pose]]] = []
        self._prev_accepted_timestamp = float("-inf")
        self._frame_delta_t_sec = 1.0 / settings.frame_decimation_rate_hz
        self._decimate_on_load = bool(settings.get("decimate_on_load", True))

    def process_lidar(self, lidar_scan: LidarScan, gt_pose: Optional[Pose]) -> None:
        if self._lidar_only:
            scan_time = lidar_scan.get_start_time()
            dt = self._frame_delta_t_sec - self._settings.frame_delta_t_sec_tolerance
            if self._decimate_on_load or scan_time - self._prev_accepted_timestamp >= dt:
                frame = Frame(None, lidar_scan, self._t_lidar_to_camera)
                frame._gt_lidar_pose = gt_pose
                self._completed_frames.append(frame.clone())
                self._prev_accepted_timestamp = scan_time
        else:
            self._lidar_scans.append((lidar_scan, gt_pose))
            self._match_images_to_scans()

    def process_image(self, image: Image) -> None:
        if (
            image.timestamp - self._prev_accepted_timestamp
            >= self._frame_delta_t_sec - self._settings.frame_delta_t_sec_tolerance
        ):
            self._prev_accepted_timestamp = image.timestamp
            frame = Frame(image=image, T_lidar_to_camera=self._t_lidar_to_camera)
            self._in_progress_frames.append(frame.clone())
            self._match_images_to_scans()

    def _match_images_to_scans(self) -> None:
        """Pair queued images with the scan covering their timestamp
        (reference frame_synthesis.py:86-126)."""
        remaining: List[Frame] = []
        for frame in self._in_progress_frames:
            if not self._lidar_scans:
                remaining.append(frame)
                continue
            tol = self._settings.frame_match_tolerance
            ts = frame.image.timestamp
            match_idx = None
            for i, (scan, _) in enumerate(self._lidar_scans):
                if scan.get_start_time() - tol <= ts <= scan.get_end_time() + tol:
                    match_idx = i
                    break
            if match_idx is None:
                if self._lidar_scans[0][0].get_start_time() - tol > ts:
                    print(f"Skipped frame with image TS {ts}")
                    continue  # scans have moved past this image
                remaining.append(frame)  # wait for future scans
                continue
            scan, gt = self._lidar_scans[match_idx]
            frame.lidar_points = scan
            frame._gt_lidar_pose = gt
            self._lidar_scans = self._lidar_scans[match_idx + 1 :]
            if len(frame.lidar_points) > 0:
                self._completed_frames.append(frame)
        self._in_progress_frames = remaining

    def has_frame(self) -> bool:
        return len(self._completed_frames) != 0

    def pop_frame(self) -> Optional[Frame]:
        if not self._completed_frames:
            return None
        return self._completed_frames.pop(0)
