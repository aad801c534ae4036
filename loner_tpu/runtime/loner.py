"""Loner: the top-level SLAM orchestrator.

TPU-native counterpart of the reference Loner (src/loner.py:38-278).
Architectural stance (SURVEY §7.1): ONE process. The reference spawns
tracker and mapper as separate torch.multiprocessing processes joined by
manager queues; here they are host threads over plain queues, and the
tracking/mapping overlap comes from XLA async dispatch — the mapper's
phase runner is a single device computation per keyframe, so the tracker
thread's ICP dispatches interleave with it.

Preserved contracts: the four signals (rgb, lidar [synchronous], frame,
keyframe-update), the 2-phase StopSignal shutdown handshake, the
single-threaded deterministic mode (deep-copy queues), world_cube.yaml /
full_config.yaml / full_config.pkl dumps, and the output directory layout
``outputs/<experiment>_<MMDDYY_HHMMSS>/[config_<i>/][trial_<j>/]``.
"""
from __future__ import annotations

import datetime
import os
import pickle
import threading
import time
from typing import List, Optional, Union

import numpy as np
import yaml

from loner_tpu.common.pose import Pose
from loner_tpu.common.sensors import Image, LidarScan
from loner_tpu.common.settings import Settings
from loner_tpu.common.signals import Signal, SharedState, StopSignal
from loner_tpu.common.world_cube import WorldCube, compute_world_cube
from loner_tpu.mapping.mapper import Mapper
from loner_tpu.runtime.logger import DefaultLogger
from loner_tpu.runtime.profiling import RunProfiler
from loner_tpu.tracking.tracker import Tracker


class Loner:
    def __init__(self, settings: Union[Settings, str]) -> None:
        if isinstance(settings, str):
            settings = Settings.load_from_file(settings)
        self._settings = settings
        self._single_threaded = bool(settings.system.single_threaded)

        self._rgb_signal = Signal(synchronous=True, single_process=self._single_threaded)
        self._lidar_signal = Signal(synchronous=True, single_process=self._single_threaded)
        self._frame_signal = Signal(single_process=self._single_threaded)
        self._keyframe_update_signal = Signal(single_process=self._single_threaded)

        self._mapper: Optional[Mapper] = None
        self._tracker: Optional[Tracker] = None
        self._tracking_thread: Optional[threading.Thread] = None
        self._mapping_thread: Optional[threading.Thread] = None

        self._world_cube: Optional[WorldCube] = None
        self._initialized = False
        self._shared_state = SharedState()
        self._lidar_only = bool(settings.system.lidar_only)

    # -- setup -----------------------------------------------------------------
    def initialize(
        self,
        camera_to_lidar: Optional[np.ndarray],
        all_lidar_poses: Optional[np.ndarray],
        k_camera: Optional[np.ndarray],
        ray_range: List[float],
        image_size=None,
        dataset_path: str = ".",
        experiment_name: Optional[str] = None,
        config_idx: Optional[int] = None,
        trial_idx: Optional[int] = None,
        traj_bounding_box: Optional[dict] = None,
        log_directory: Optional[str] = None,
    ) -> None:
        self._world_cube = compute_world_cube(
            camera_to_lidar if not self._lidar_only else None,
            k_camera,
            image_size,
            all_lidar_poses,
            ray_range,
            padding=0.3,
            traj_bounding_box=traj_bounding_box,
        )
        self._initialized = True
        self._dataset_path = os.path.abspath(os.path.expanduser(dataset_path))

        now_str = datetime.datetime.now().strftime("%m%d%y_%H%M%S")
        expname = self._settings.get("experiment_name", "experiment")
        self._experiment_name = f"{expname}_{now_str}"
        prefix = os.path.expanduser(self._settings.system.log_dir_prefix)
        if log_directory is not None:
            # Mid-run resume (runtime/resume.py): continue in an existing
            # run directory — CSV timing logs append, checkpoints keep
            # numbering, config dumps are rewritten identically.
            self._log_directory = os.path.abspath(log_directory)
            self._experiment_name = os.path.basename(self._log_directory)
        elif experiment_name is None:
            self._log_directory = os.path.join(prefix, self._experiment_name)
        else:
            self._log_directory = os.path.join(prefix, experiment_name)
            if config_idx is not None:
                self._log_directory = os.path.join(self._log_directory, f"config_{config_idx}")
            if trial_idx is not None:
                self._log_directory = os.path.join(self._log_directory, f"trial_{trial_idx}")
        os.makedirs(self._log_directory, exist_ok=True)

    def get_world_cube(self) -> WorldCube:
        return self._world_cube

    @property
    def log_directory(self) -> str:
        return self._log_directory

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> None:
        if not self._initialized:
            raise RuntimeError("Can't Start: System Uninitialized. Call initialize first.")

        self._logger = DefaultLogger(
            self._frame_signal, self._keyframe_update_signal, self._log_directory
        )

        s = self._settings
        s["experiment_name"] = self._experiment_name
        s["dataset_path"] = self._dataset_path
        s["log_directory"] = self._log_directory
        s["world_cube"] = self._world_cube.as_dict()
        for sub in ("mapper", "tracker"):
            s[sub]["experiment_name"] = self._experiment_name
            s[sub]["log_directory"] = self._log_directory
            s[sub]["lidar_only"] = self._lidar_only
        # Multi-chip: shard the mapping optimization over a device mesh
        # (system.mesh_devices: int N for a 1-D keyframe-slot mesh, or
        # [kf, ray] for the 2-axis mesh; 0/absent = single device).
        s["mapper"]["mesh_devices"] = s.system.get("mesh_devices", 0) or 0

        # Debug flags ANDed with global enable (reference loner.py:157-162).
        debug = {
            key: bool(val) and bool(s.debug.global_enabled)
            for key, val in s.debug.flags.items()
        }
        s["debug"] = Settings({"flags": s.debug.flags, "global_enabled": s.debug.global_enabled, **debug})
        s["mapper"]["debug"] = s["debug"]
        s["tracker"]["debug"] = s["debug"]

        with open(os.path.join(self._log_directory, "world_cube.yaml"), "w") as f:
            yaml.safe_dump(self._world_cube.as_dict(), f)
        with open(os.path.join(self._log_directory, "full_config.yaml"), "w") as f:
            yaml.safe_dump(Settings(s).as_plain_dict(), f, sort_keys=False)
        with open(os.path.join(self._log_directory, "full_config.pkl"), "wb") as f:
            pickle.dump(s.as_plain_dict(), f)

        self._profiler = RunProfiler(
            self._log_directory, enabled=bool(s.debug.get("profile", False))
        )
        self._profiler.start()

        self._mapper = Mapper(
            s.mapper,
            self._frame_signal,
            self._keyframe_update_signal,
            self._world_cube,
            enable_sky_segmentation=bool(s.system.sky_segmentation),
            calibration=None if self._lidar_only else s.calibration,
        )
        self._tracker = Tracker(s, self._rgb_signal, self._lidar_signal, self._frame_signal)

        print("Starting LONER-TPU SLAM")
        if not self._single_threaded:
            self._tracking_thread = threading.Thread(
                target=self._tracker.run, args=(self._shared_state,), daemon=True
            )
            self._mapping_thread = threading.Thread(
                target=self._mapper.run, args=(self._shared_state,), daemon=True
            )
            self._tracking_thread.start()
            self._mapping_thread.start()

    def warm_up(self, n_points: int) -> float:
        """Pre-compile the tracking (ICP) and mapping (phase runner)
        device programs before any data streams in.

        Under XLA every distinct program pays a one-time compile
        (~20-60 s each on the TPU); without warm-up those compiles land
        inside the real-time loop and stall the first keyframes (the
        reference has no analog — CUDA kernels are precompiled). Call
        between start() and the first process_lidar with the per-scan
        point count (pow2 bucket is what matters; see
        Optimizer.warm_up)."""
        if self._tracker is None or self._mapper is None:
            raise RuntimeError("warm_up must be called after start()")
        t_track = self._tracker.warm_up()
        t_map = self._mapper.warm_up(n_points)
        print(f"Warm-up: tracker compiled in {t_track:.1f}s, "
              f"mapper in {t_map:.1f}s")
        return t_track + t_map

    def stop(self) -> None:
        if not self._single_threaded:
            print("Stopping LONER-TPU SLAM workers")
            self._lidar_signal.emit(StopSignal())
            self._rgb_signal.emit(StopSignal())
            while not self._tracker.processed_stop_signal:
                self._logger.update()
                time.sleep(0.1)
            # No new frames will be emitted; now stop the mapper.
            self._frame_signal.emit(StopSignal())
            while not self._mapper.processed_stop_signal:
                self._logger.update()
                time.sleep(0.1)

        if self._single_threaded:
            # Drain the tracker's pipelined ICP (one frame can still be
            # in flight) and let the mapper consume it before finishing.
            self._tracker.flush()
            self._mapper.update()

        self._profiler.stop()
        self._logger.finish()

        if not self._single_threaded:
            self._tracking_thread.join(timeout=30)
            self._mapping_thread.join(timeout=30)
        else:
            self._mapper.finish()
        print("LONER-TPU successfully terminated.")

    # -- data ingestion ---------------------------------------------------------
    def _system_update(self) -> None:
        assert self._single_threaded
        self._tracker.update()
        self._mapper.update()

    def process_lidar(self, lidar_scan: LidarScan, gt_pose: Optional[Pose] = None) -> None:
        assert np.all(np.diff(lidar_scan.timestamps) >= 0), "sort your points by timestamps!"
        self._logger.update()
        self._lidar_signal.emit((lidar_scan, gt_pose))
        if self._single_threaded:
            self._system_update()

    def process_rgb(self, image: Image) -> None:
        self._logger.update()
        self._rgb_signal.emit(image)
        if self._single_threaded:
            self._system_update()
