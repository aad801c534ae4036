"""Mapper: top-level mapping module — keyframe gating + optimization +
checkpointing.

TPU-native counterpart of the reference Mapper (src/mapping/mapper.py:
30-180). Drains the frame signal, elects keyframes, runs the windowed
optimization, emits pose states, and writes checkpoints with the
reference's cadence and file naming (ckpt_<kf>.tar per keyframe — poses
only at DISABLED/STANDARD off-cycle, full state every 10 at STANDARD /
every keyframe at VERBOSE — and final.tar at shutdown).
"""
from __future__ import annotations

import copy
import os
import pickle
import time
from typing import Optional, Union

import numpy as np

from loner_tpu.common.frame import Frame
from loner_tpu.common.signals import Signal, SharedState, StopSignal
from loner_tpu.common.world_cube import WorldCube
from loner_tpu.mapping.keyframe_manager import KeyFrameManager
from loner_tpu.mapping.optimizer import Optimizer, OptimizerConfig
from loner_tpu.models.field import FieldConfig


def save_checkpoint(path: str, ckpt: dict) -> None:
    """Checkpoints are pickled dicts of numpy arrays (keeps the reference's
    .tar file naming so the analysis CLI contract is unchanged)."""
    with open(path, "wb") as f:
        pickle.dump(ckpt, f)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


class Mapper:
    def __init__(
        self,
        settings,
        frame_signal: Signal,
        keyframe_update_signal: Signal,
        world_cube: WorldCube,
        optimizer: Optional[Optimizer] = None,
        enable_sky_segmentation: bool = False,
        calibration=None,
    ) -> None:
        self._frame_slot = frame_signal.register()
        self._keyframe_update_signal = keyframe_update_signal
        self._settings = settings
        self._world_cube = world_cube

        # Per-trial seed (mapper.optimizer.seed): run_loner offsets it by
        # the trial index so --num_repeats produces genuinely independent
        # trials. The pipeline is otherwise deterministic (explicit PRNG
        # keys everywhere) — the reference's trial variance comes free
        # from CUDA nondeterminism; ours must be opted into.
        seed = int(settings.optimizer.get("seed", 0))
        self._keyframe_manager = KeyFrameManager(settings.keyframe_manager, seed=seed)

        if optimizer is None:
            model_cfg = settings.optimizer.model_config
            # The reference dispatches on model_type (model_tcnn.py:29);
            # only nerf_decoupled exists. Fail loudly on anything else
            # rather than silently building the default model.
            model_type = str(model_cfg.model.get("model_type", "nerf_decoupled"))
            if model_type != "nerf_decoupled":
                raise ValueError(f"unknown model_type {model_type!r}")
            opt_cfg = OptimizerConfig.from_settings(settings.optimizer, model_cfg)
            if enable_sky_segmentation and settings.optimizer.num_samples.sky > 0:
                opt_cfg = type(opt_cfg)(**{**opt_cfg.__dict__, "enable_sky": True})
            field_cfg = FieldConfig.from_settings(
                model_cfg.model.nerf_config, int(model_cfg.model.num_colors)
            )
            # Multi-chip mesh: 0/absent = single device (mesh_devices is
            # injected from system.mesh_devices by Loner.start). An int N
            # builds a 1-D keyframe-slot mesh; a [kf, ray] pair builds
            # the 2-axis mesh that additionally shards each slot's point
            # buffer over the ray axis (parallel/mesh.py::make_mesh_2d —
            # for slices wider than the window).
            mesh = None
            n_mesh = settings.get("mesh_devices", 0) or 0
            if isinstance(n_mesh, (list, tuple)):
                from loner_tpu.parallel.mesh import make_mesh_2d

                if int(n_mesh[0]) * int(n_mesh[1]) > 1:
                    mesh = make_mesh_2d(int(n_mesh[0]), int(n_mesh[1]))
            elif int(n_mesh) > 1:
                from loner_tpu.parallel.mesh import make_mesh

                mesh = make_mesh(int(n_mesh))
            camera_rays = _build_camera_geometry(calibration)
            optimizer = Optimizer(
                opt_cfg,
                field_cfg,
                world_cube.scale_factor,
                world_cube.shift,
                settings.optimizer.keyframe_schedule,
                seed=seed,
                skip_pose_refinement=bool(settings.optimizer.skip_pose_refinement),
                use_gt_poses=bool(settings.debug.get("use_groundtruth_poses", False)),
                freeze_poses=bool(settings.optimizer.freeze_poses),
                mesh=mesh,
                camera_rays=camera_rays,
                log_directory=settings.get("log_directory"),
                profile_optimizer=bool(settings.debug.get("profile_optimizer", False)),
                log_losses=bool(settings.debug.get("log_losses", False)),
                write_ray_point_clouds=bool(
                    settings.debug.get("write_ray_point_clouds", False)
                ),
                store_ray=bool(settings.debug.get("store_ray", False)),
                draw_samples=bool(settings.debug.get("draw_samples", False)),
                draw_rays_eps=bool(settings.debug.get("draw_rays_eps", False)),
            )
        self._optimizer = optimizer

        self.processed_stop_signal = False
        self._shared_state: Optional[SharedState] = None
        self._optimizer_enabled = bool(settings.optimizer.get("enabled", True))
        self._log_level = settings.get("log_level", "DISABLED")
        self._log_directory = settings.get("log_directory", ".")
        os.makedirs(f"{self._log_directory}/checkpoints", exist_ok=True)

    @property
    def optimizer(self) -> Optimizer:
        return self._optimizer

    @property
    def keyframe_manager(self) -> KeyFrameManager:
        return self._keyframe_manager

    def warm_up(self, n_points: int) -> float:
        """Pre-compile all reachable phase-runner programs (see
        Optimizer.warm_up). Call before streaming starts; safe to skip
        (the first keyframe then pays the compiles inline)."""
        if not self._optimizer_enabled:
            return 0.0
        return self._optimizer.warm_up(n_points)

    def update(self) -> bool:
        tic = time.time()
        did_map_frame = False
        did_work = False

        if self._frame_slot.has_value():
            new_frame: Union[StopSignal, Frame] = self._frame_slot.get_value()
            did_work = True
            if isinstance(new_frame, StopSignal):
                self.processed_stop_signal = True
                return True

            if self._settings.debug.get("use_groundtruth_poses", False):
                # Shallow-copy so the GT substitution never mutates the
                # Frame shared with the logger thread (scans are shared
                # read-only; only the pose slot is replaced).
                new_frame = copy.copy(new_frame)
                new_frame._lidar_pose = new_frame._gt_lidar_pose

            new_keyframe = self._keyframe_manager.process_frame(new_frame)
            accepted = new_keyframe is not None

            if self._shared_state is not None:
                self._shared_state.last_mapped_frame_time = (
                    self._keyframe_manager.get_last_mapped_time()
                )

            if self._optimizer_enabled and accepted:
                window = self._keyframe_manager.get_active_window()
                self._optimizer.iterate_optimizer(window)

                pose_state = self._keyframe_manager.get_poses_state()
                kf_idx = self._optimizer._keyframe_count - 1

                if (kf_idx % 10 == 0 and self._log_level == "STANDARD") or (
                    self._log_level == "VERBOSE"
                ):
                    save_checkpoint(
                        f"{self._log_directory}/checkpoints/ckpt_{kf_idx}.tar",
                        self.build_ckpt(),
                    )
                else:
                    save_checkpoint(
                        f"{self._log_directory}/checkpoints/ckpt_{kf_idx}.tar",
                        {
                            "global_step": self._optimizer.state.global_step,
                            "poses": pose_state,
                        },
                    )

                self._keyframe_update_signal.emit(pose_state)
                did_map_frame = True
        else:
            if self._shared_state is not None:
                t = self._keyframe_manager.get_last_mapped_time()
                if t is not None:
                    self._shared_state.last_mapped_frame_time = t

        if did_map_frame and self._settings.debug.get("log_times", False):
            with open(f"{self._log_directory}/map_times.csv", "a+") as f:
                f.write(f"{time.time() - tic}\n")
        return did_work

    def run(self, shared_state: SharedState) -> None:
        self._shared_state = shared_state
        while not self.processed_stop_signal:
            did_work = self.update()
            time.sleep(1e-4 if did_work else 5e-3)
        self.finish()
        print("Mapping Done.")

    def build_ckpt(self) -> dict:
        """Full checkpoint (reference mapper.py:161-175 schema)."""
        opt = self._optimizer
        ckpt = {
            "global_step": opt.state.global_step,
            "network_state_dict": jax_tree_to_numpy(opt.state.field_params),
            "poses": self._keyframe_manager.get_poses_state(),
            "world_cube": self._world_cube.as_dict(),
        }
        if opt._cfg.samples_strategy in ("OGM", "PROPOSAL"):
            # Either the dense logit grid (OGM) or the proposal-MLP
            # parameter pytree (PROPOSAL) — consumers pick the sampler by
            # the state's structure (models/rendering.py::make_sampler).
            ckpt["occ_model_state_dict"] = jax_tree_to_numpy(opt.state.occ_grid)
        return ckpt

    def finish(self) -> None:
        path = f"{self._log_directory}/checkpoints/final.tar"
        print("Saving Last Checkpoint to", path)
        save_checkpoint(path, self.build_ckpt())

    def restore_from_checkpoint(self, ckpt: dict, kf_frames) -> None:
        """Mid-run resume (runtime/resume.py): rebuild the keyframe set
        from the checkpoint's pose states + re-read Frames and re-seat
        the optimizer's map/pose state. ``kf_frames[i]`` must be the
        Frame whose scan matches ``ckpt['poses'][i]['timestamp']``."""
        from loner_tpu.mapping.keyframe import KeyFrame

        states = ckpt["poses"]
        if len(states) != len(kf_frames):
            raise ValueError(
                f"checkpoint has {len(states)} keyframes, got "
                f"{len(kf_frames)} rebuilt frames"
            )
        keyframes = [
            KeyFrame.from_pose_state(frame, state, anchored=(i == 0))
            for i, (state, frame) in enumerate(zip(states, kf_frames))
        ]
        self._keyframe_manager.restore(keyframes)
        self._optimizer.restore(
            ckpt["network_state_dict"],
            ckpt.get("occ_model_state_dict"),
            ckpt["global_step"],
            len(keyframes),
        )


def jax_tree_to_numpy(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x), tree)


def _build_camera_geometry(calibration):
    """(cam_dirs (HW, 3), lidar_to_camera (4, 4)) for the intensity-
    training branch, or None when no camera intrinsics are configured
    (lidar-only — the flagship mode)."""
    if calibration is None:
        return None
    intr = calibration.camera_intrinsic
    if intr.get("k") is None or intr.get("width") is None:
        return None
    from loner_tpu.common.camera import get_ray_directions
    from loner_tpu.common.pose import Pose

    k = np.asarray(intr.k, np.float64).reshape(3, 3)
    new_k = intr.get("new_k")
    new_k = k if new_k is None else np.asarray(new_k, np.float64).reshape(3, 3)
    dist = intr.get("distortion")
    dirs, _, _ = get_ray_directions(
        int(intr.height), int(intr.width), new_k,
        dist=None if dist is None else np.asarray(dist, np.float64),
        k=k,
    )
    l2c = Pose.from_settings(calibration.lidar_to_camera).matrix
    return dirs.astype(np.float32), np.asarray(l2c, np.float32)
