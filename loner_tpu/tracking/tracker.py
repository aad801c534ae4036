"""Tracker: frame-to-frame ICP odometry.

TPU-native counterpart of the reference Tracker
(src/tracking/tracker.py:31-296): decimated frames are registered against
the previous frame's cloud with the 2-stage point-to-plane ICP schedule
(here: batched XLA ICP on device instead of Open3D C++ on host), chained
onto the reference pose, optionally motion-compensated into the new frame,
and optionally augmented with sky rays found via spherical-projection
morphology. Runs as a host thread in the single-process pipeline; the
throttle against the mapper uses SharedState.
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np
from scipy import ndimage

from loner_tpu.common.frame import Frame
from loner_tpu.common.pose import Pose
from loner_tpu.common.signals import Signal, SharedState, StopSignal
from loner_tpu.tracking.frame_synthesis import FrameSynthesis
from loner_tpu.tracking.icp import run_icp_schedule
from loner_tpu.ops.voxel import voxel_downsample


class Tracker:
    def __init__(
        self,
        settings,
        rgb_signal: Optional[Signal],
        lidar_signal: Signal,
        frame_signal: Signal,
    ) -> None:
        self._rgb_slot = rgb_signal.register() if rgb_signal is not None else None
        self._lidar_slot = lidar_signal.register()
        self._frame_signal = frame_signal
        self._settings = settings.tracker
        self._lidar_only = settings.system.lidar_only

        self._t_lidar_to_camera = Pose.from_settings(
            settings.calibration.lidar_to_camera
        )
        self._frame_synthesizer = FrameSynthesis(
            self._settings.frame_synthesis, self._t_lidar_to_camera, self._lidar_only
        )

        self.processed_stop_signal = False

        self._reference_points: Optional[np.ndarray] = None
        self._reference_pose = Pose.identity()
        self._reference_time: Optional[float] = None
        # Constant-velocity model: last frame-to-frame relative transform,
        # used as the ICP initial guess (the reference always starts from
        # identity, tracker.py:201 — this roughly doubles the tolerable
        # per-frame motion).
        self._last_relative = np.eye(4)
        self._use_velocity_init = bool(
            self._settings.icp.get("constant_velocity_init", True)
        )
        # Software-pipelined ICP (TPU-native; no reference analog — its
        # Open3D ICP is a synchronous host call): frame i+1's fused ICP
        # program is DISPATCHED (XLA async) before frame i's result is
        # fetched, with the constant-velocity init chained as a device
        # array, so the host<->device round trip of result i overlaps the
        # execution of program i+1. Each frame's emission shifts one
        # frame later (~1/frame_rate); the host-blocking time per frame
        # collapses from a full dispatch round trip to a result fetch.
        self._pipelined = bool(self._settings.icp.get("pipelined", True))
        # Multi-chip: `tracker.icp.device: k` pins the ICP stack to
        # jax.devices()[k], so tracking never serializes behind mapping
        # dispatch chunks on the mapper's chip (the single-chip latency
        # floor quantified in artifacts/track_latency_r4/ — the reference
        # gets the same isolation from CUDA preempting between its
        # tracker/mapper processes on one GPU, loner.py:204-205). Absent
        # or out of range = the default device (single-chip behavior).
        dev_idx = self._settings.icp.get("device", None)
        self._icp_device = None
        if dev_idx is not None:
            import jax  # deferred like the fetch path: keep module import light

            devices = jax.devices()
            if 0 <= int(dev_idx) < len(devices):
                self._icp_device = devices[int(dev_idx)]
        self._pending = None  # (frame, ICPResult, cloud)
        self._last_relative_dev = None  # device-array init for the chain
        self._good_cloud: Optional[np.ndarray] = None  # last ACCEPTED cloud

        self._frame_count = 0
        self._last_tracked_frame_time = 0.0
        self._shared_state: Optional[SharedState] = None

        self._frame_rate = self._settings.frame_synthesis.frame_decimation_rate_hz
        self._max_time_delta = self._settings.synchronization.max_time_delta
        self._icp_pad = int(
            self._settings.icp.downsample.get("target_uniform_point_count", 5000)
        )

    # -- warm-up -------------------------------------------------------------
    def warm_up(self) -> float:
        """Pre-compile the ICP stack (kNN normals + every schedule stage)
        on dummy clouds at the configured pad size, so the first real
        frame doesn't pay XLA compiles inside the tracking loop. Returns
        wall-clock seconds spent."""
        t0 = time.time()
        rng = np.random.default_rng(0)
        cloud = rng.uniform(-5.0, 5.0, (self._icp_pad, 3)).astype(np.float32)
        target = cloud + rng.normal(0, 0.01, cloud.shape).astype(np.float32)
        init = np.eye(4) if self._use_velocity_init else None
        run_icp_schedule(
            cloud,
            target,
            [dict(s) for s in self._settings.icp.schedule],
            pad_size=self._icp_pad,
            init=init,
            device=self._icp_device,
        )
        return time.time() - t0

    # -- resume --------------------------------------------------------------
    def seed_reference(self, frame: Frame) -> None:
        """Mid-run resume (runtime/resume.py): prime the tracking chain
        from a restored keyframe. The frame's pose must be its TRACKED
        pose — post-resume ICP then chains exactly like the original
        run, and the keyframe manager's re-basing onto the optimized
        reference stays a single correction (seeding with the optimized
        pose would double-apply it)."""
        cloud = self._build_icp_cloud(frame)
        self._reference_points = cloud
        self._good_cloud = cloud
        self._reference_pose = frame.get_lidar_pose().clone()
        self._reference_time = frame.get_middle_time()
        self._last_relative = np.eye(4)
        self._last_relative_dev = None
        self._pending = None
        self._last_tracked_frame_time = frame.get_time()
        # Decimation cadence continues from the seed frame.
        self._frame_synthesizer._prev_accepted_timestamp = frame.get_time()

    # -- pipeline ------------------------------------------------------------
    def update(self) -> bool:
        tic = time.time()
        num_tracked = 0
        did_work = False

        # Throttle: don't run ahead of the mapper (reference tracker.py:86-88).
        if (
            self._settings.synchronization.enabled
            and self._shared_state is not None
            and self._shared_state.last_mapped_frame_time is not None
        ):
            while (
                self._last_tracked_frame_time
                - (self._shared_state.last_mapped_frame_time + self._max_time_delta)
                > 1.0 / self._frame_rate
            ):
                time.sleep(0.01)

        if self._rgb_slot is not None and self._rgb_slot.has_value():
            val = self._rgb_slot.get_value()
            if isinstance(val, StopSignal):
                self.processed_stop_signal = True
                return True
            self._frame_synthesizer.process_image(val)
            did_work = True

        if self._lidar_slot.has_value():
            val = self._lidar_slot.get_value()
            if isinstance(val, StopSignal):
                # Drain the ICP pipeline BEFORE confirming the stop: the
                # mapper must see the last in-flight frame ahead of its
                # own StopSignal (Loner emits it only after this flag).
                self.flush()
                self.processed_stop_signal = True
                return True
            scan, gt_pose = val
            self._frame_synthesizer.process_lidar(scan, gt_pose)
            did_work = True

        while self._frame_synthesizer.has_frame():
            frame = self._frame_synthesizer.pop_frame()
            frame._id = self._frame_count
            self._frame_count += 1
            for done in self.track_frame(frame):
                self._emit_frame(done)
                num_tracked += 1

        if num_tracked > 0 and self._settings.get("debug", {}).get("log_times", False):
            with open(f"{self._settings.log_directory}/track_times.csv", "a+") as f:
                f.write(f"{time.time() - tic},{num_tracked}\n")
        return did_work or num_tracked > 0

    def _emit_frame(self, frame: Frame) -> None:
        if self._settings.get("compute_sky_rays", False):
            self.compute_sky_rays(frame)
        if self._settings.get("debug", {}).get("write_frame_point_clouds", False):
            from loner_tpu.runtime.debug_artifacts import dump_frame_point_cloud

            dump_frame_point_cloud(
                frame, self._settings.log_directory, frame._id
            )
        self._frame_signal.emit(frame)
        self._last_tracked_frame_time = frame.get_time()

    def flush(self) -> None:
        """Resolve + emit any in-flight pipelined frame."""
        for done in self.finish():
            self._emit_frame(done)

    def run(self, shared_state: SharedState) -> None:
        self._shared_state = shared_state
        while not self.processed_stop_signal:
            # Back off when idle: on small hosts a busy poll starves the
            # sibling mapper thread's compute dispatch.
            did_work = self.update()
            time.sleep(1e-4 if did_work else 5e-3)
        # Drain leftovers so no producer can rendezvous on a dead consumer.
        for slot in (self._lidar_slot, self._rgb_slot):
            if slot is not None:
                while slot.has_value():
                    slot.get_value()
        print("Tracking Done.")

    # -- core -----------------------------------------------------------------
    def _build_icp_cloud(self, frame: Frame) -> np.ndarray:
        downsample_type = self._settings.icp.downsample.type
        scan_duration = self._settings.icp.scan_duration
        if downsample_type in (None, "NONE"):
            return frame.build_point_cloud(scan_duration=scan_duration)
        if downsample_type == "VOXEL":
            pts = frame.build_point_cloud(scan_duration=scan_duration)
            return voxel_downsample(
                pts, self._settings.icp.downsample.voxel_downsample_size
            )
        if downsample_type == "UNIFORM":
            return frame.build_point_cloud(
                scan_duration=scan_duration,
                target_points=self._settings.icp.downsample.target_uniform_point_count,
            )
        raise ValueError(f"Unrecognized downsample type {downsample_type}")

    def _dispatch_icp(self, cloud: np.ndarray, target: np.ndarray, init):
        return run_icp_schedule(
            cloud,
            target,
            [dict(s) for s in self._settings.icp.schedule],
            pad_size=self._icp_pad,
            init=init,
            device=self._icp_device,
        )

    def _apply_registration(self, frame: Frame, registration: np.ndarray) -> None:
        """Compose the tracked pose, motion-compensate, and advance the
        good-chain state (reference tracker.py:225-254)."""
        # Re-project onto SE(3): the registration is device-computed
        # (orthonormal to f32 round-off even after icp.py's own
        # projection) and this chain composes one per frame for the whole
        # run — without the projection the accumulated scale warps the
        # motion-compensated scans (det reached 1.05 in 45 s; ATE 2.5x).
        tracked = Pose(self._reference_pose.matrix @ registration).orthonormalized()
        new_reference_time = frame.get_middle_time()
        frame._lidar_pose = tracked

        if self._settings.motion_compensation.enabled:
            frame.lidar_points.motion_compensate(
                (self._reference_pose, frame._lidar_pose),
                (self._reference_time, new_reference_time),
                frame._lidar_pose,
            )

        self._reference_time = new_reference_time
        self._reference_pose = tracked
        self._last_relative = registration

    def _resolve_pending(self):
        """Fetch the in-flight frame's ICP result. Returns (frame | None,
        chain_ok)."""
        frame, result, cloud = self._pending
        self._pending = None
        # ONE batched fetch for transform + fitness (two np.asarray calls
        # would pay the tunnel round trip twice).
        import jax

        reg32, fitness = jax.device_get((result.transformation, result.fitness))
        registration = np.asarray(reg32, np.float64)
        min_fitness = float(self._settings.icp.get("min_fitness", 0.1))
        ok = (
            np.isfinite(registration).all()
            and float(fitness) >= min_fitness
        )
        if not ok:
            # Failure detection the reference lacks (its track_frame
            # always returns True, tracker.py:118-120): drop the frame,
            # restore the last good reference cloud, and break the
            # device-chained velocity init (it holds the bad transform).
            self._reference_points = self._good_cloud
            self._last_relative_dev = None
            return None, False
        self._apply_registration(frame, registration)
        self._good_cloud = cloud
        return frame, True

    def track_frame(self, frame: Frame):
        """Track one frame. Returns the list of frames READY TO EMIT
        (with poses set): in pipelined mode each frame's result resolves
        when the next frame arrives, so the list holds the PREVIOUS
        frame (or nothing at the pipeline head)."""
        cloud = self._build_icp_cloud(frame)

        if self._reference_points is None:
            # First frame anchors the coordinate system (tracker.py:186-196).
            frame._lidar_pose = self._reference_pose.clone()
            self._reference_points = cloud
            self._good_cloud = cloud
            self._reference_time = frame.get_middle_time()
            return [frame]

        if not self._pipelined:
            # Same fetch/validate/apply sequence as the pipelined path,
            # just resolved immediately (one acceptance rule, one code
            # path — _resolve_pending owns it).
            result = self._dispatch_icp(
                cloud,
                self._reference_points,
                self._last_relative if self._use_velocity_init else None,
            )
            self._pending = (frame, result, cloud)
            emitted, _ = self._resolve_pending()
            if emitted is None:
                print("Warning: Failed to track frame. Skipping.")
                return []
            self._reference_points = cloud
            return [emitted]

        # Pipelined: dispatch THIS frame's registration against the
        # previous frame's cloud first (XLA async — returns immediately),
        # with the velocity init chained as a DEVICE array (the previous
        # program's output, consumed without any host sync)...
        if self._use_velocity_init:
            init = (
                self._last_relative_dev
                if self._last_relative_dev is not None
                else self._last_relative
            )
        else:
            init = None
        result = self._dispatch_icp(cloud, self._reference_points, init)
        self._last_relative_dev = result.transformation

        # ...then fetch the PREVIOUS frame's result — its round trip
        # overlapped this frame's arrival and program execution.
        out = []
        if self._pending is not None:
            emitted, chain_ok = self._resolve_pending()
            if emitted is not None:
                out.append(emitted)
            if not chain_ok:
                print("Warning: Failed to track frame. Skipping.")
                # The dispatch above registered against the REJECTED
                # frame's cloud — redo it against the restored good
                # reference (rare path; synchronous is fine).
                result = self._dispatch_icp(
                    cloud,
                    self._reference_points,
                    self._last_relative if self._use_velocity_init else None,
                )
                self._last_relative_dev = result.transformation

        self._pending = (frame, result, cloud)
        self._reference_points = cloud
        return out

    def finish(self):
        """Drain the ICP pipeline: resolve + return the last in-flight
        frame (call when the stream ends, before shutdown)."""
        if self._pending is None:
            return []
        emitted, _ = self._resolve_pending()
        if emitted is None:
            print("Warning: Failed to track frame. Skipping.")
            return []
        self._good_cloud = self._reference_points
        return [emitted]

    # -- sky rays --------------------------------------------------------------
    def compute_sky_rays(self, frame: Frame) -> None:
        """Find directions with no lidar return above the horizon via
        spherical-projection morphology (reference tracker.py:257-296).
        Stored SENSOR-frame (see keyframe.sky_dirs for why)."""
        TOP_ROWS = 3
        HORIZON_OFFSET = 10.0

        dirs = frame.lidar_points.ray_directions
        x, y, z = dirs[0], dirs[1], dirs[2]
        theta = np.round(np.rad2deg(np.arctan2(y, x))).astype(np.int64)
        phi = np.round(np.rad2deg(np.arctan2(np.sqrt(x * x + y * y), z))).astype(np.int64)

        phi_img = phi - phi.min()
        theta_img = theta - theta.min()
        theta_img[theta_img == 360] = 0

        img = np.zeros((phi_img.max() + 1, 360), np.uint8)
        img[phi_img, theta_img] = 1
        img = ndimage.binary_dilation(img, np.ones((3, 3)))
        img = ndimage.binary_erosion(img, np.ones((3, 3))).astype(np.uint8)
        img[:TOP_ROWS] = 1

        zero_phi, zero_theta = np.nonzero(img == 0)
        zero_phi = np.deg2rad(zero_phi + phi.min())
        zero_theta = np.deg2rad(zero_theta + theta.min())

        z_out = np.cos(zero_phi)
        y_out = np.sin(zero_phi) * np.sin(zero_theta)
        x_out = np.sin(zero_phi) * np.cos(zero_theta)
        zero_dirs = np.stack([x_out, y_out, z_out])  # sensor frame

        # Keep only directions above the horizon in the WORLD frame.
        r = frame.get_lidar_pose().get_rotation()
        world = r @ zero_dirs
        phi_w = 90.0 - np.rad2deg(
            np.arctan2(np.sqrt(world[0] ** 2 + world[1] ** 2), world[2])
        )
        frame.lidar_points.sky_rays = zero_dirs[:, phi_w > HORIZON_OFFSET].astype(
            np.float32
        )
