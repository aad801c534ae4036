"""Calibration loading: OpenCV-format yaml without cv2.

TPU-native counterpart of the reference's FusionPortableCalibration
(examples/fusion_portable/fusion_portable_calibration.py:19-138): parses
the sensor extrinsic (lidar<->camera) and stereo intrinsics (K, distortion,
rectification) from OpenCV-style YAML files, scales K by an image scale
factor, and exposes the dict shape the Settings tree expects
(calibration.lidar_to_camera / calibration.camera_intrinsic).
"""
from __future__ import annotations

import os
import re
from typing import Optional

import numpy as np
import yaml


def load_opencv_yaml(path: str) -> dict:
    """OpenCV YAML files start with a %YAML directive and use !!opencv-matrix
    tags; strip both and expand matrices to numpy arrays."""
    with open(path) as f:
        text = f.read()
    text = re.sub(r"^%YAML.*\n(---)?\n?", "", text)
    text = text.replace("!!opencv-matrix", "")
    data = yaml.safe_load(text)

    def conv(v):
        if isinstance(v, dict) and {"rows", "cols", "data"} <= set(v.keys()):
            return np.asarray(v["data"], np.float64).reshape(v["rows"], v["cols"])
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        return v

    return conv(data)


class FusionPortableCalibration:
    """Loads the Fusion Portable calibration directory layout:
    <calib>/calib/ouster00.yaml (extrinsics), frame_left.yaml /
    frame_right.yaml (intrinsics + distortion + rectified P)."""

    def __init__(self, calib_path: str, image_scale_factor: float = 1.0) -> None:
        calib_dir = os.path.join(calib_path, "calib")
        if not os.path.isdir(calib_dir):
            calib_dir = calib_path

        self.t_lidar_to_left_cam = {"xyz": [0, 0, 0], "orientation": [0, 0, 0, 1]}
        ouster = os.path.join(calib_dir, "ouster00.yaml")
        if os.path.exists(ouster):
            data = load_opencv_yaml(ouster)
            q = data.get("quaternion_sensor_frame_cam00", None)
            t = data.get("translation_sensor_frame_cam00", None)
            if q is not None and t is not None:
                q = np.asarray(q).reshape(-1)  # qw qx qy qz (OpenCV convention)
                self.t_lidar_to_left_cam = {
                    "xyz": np.asarray(t).reshape(-1).tolist(),
                    "orientation": [float(q[1]), float(q[2]), float(q[3]), float(q[0])],
                }

        self.left_cam_intrinsic = self._load_cam(
            os.path.join(calib_dir, "frame_left.yaml"), image_scale_factor
        )
        self.right_cam_intrinsic = self._load_cam(
            os.path.join(calib_dir, "frame_right.yaml"), image_scale_factor
        )

    @staticmethod
    def _load_cam(path: str, scale: float) -> Optional[dict]:
        if not os.path.exists(path):
            return None
        data = load_opencv_yaml(path)
        k = np.asarray(data["camera_matrix"], np.float64)
        dist = np.asarray(data["distortion_coefficients"], np.float64).reshape(-1)
        width = int(data.get("image_width", 0) * scale)
        height = int(data.get("image_height", 0) * scale)
        k_scaled = k.copy()
        k_scaled[:2] *= scale
        new_k = None
        if "projection_matrix" in data:
            p = np.asarray(data["projection_matrix"], np.float64)
            new_k = p[:3, :3].copy()
            new_k[:2] *= scale
        return {
            "k": k_scaled,
            "distortion": dist,
            "new_k": new_k,
            "width": width,
            "height": height,
        }

    def apply_to_settings(self, settings) -> None:
        """Inject into the Settings tree (reference examples/utils.py:119)."""
        settings["calibration"]["lidar_to_camera"] = self.t_lidar_to_left_cam
        if self.left_cam_intrinsic is not None:
            settings["calibration"]["camera_intrinsic"] = self.left_cam_intrinsic
