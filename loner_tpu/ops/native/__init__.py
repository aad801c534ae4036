"""Native (C++) host ops: point-blob decode, voxel downsample, FOV mask.

Replaces the compiled third-party ingest path of the reference (ROS C++
PointCloud2 decode, Open3D C++ voxel grid — SURVEY §2.3). Built on first
use with the system compiler into ``libscan_ops.so``; every entry point
has a numpy fallback so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "scan_ops.cpp")
_LIB = os.path.join(_HERE, "libscan_ops.so")

_lib = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    try:
        if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            subprocess.run(
                ["c++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.decode_point_blob.restype = ctypes.c_int64
        lib.voxel_downsample.restype = ctypes.c_int64
        lib.fov_mask.restype = None
        return lib
    except Exception:
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        _lib = _build()
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def decode_point_blob(
    blob: bytes,
    n_points: int,
    point_step: int,
    xyz_offsets: Tuple[int, int, int],
    time_offset: int = -1,
    time_kind: int = -1,
    min_range: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """PointCloud2-style blob -> (dirs (3, M), ranges (M,), times (M,)).

    time_kind: 0 = f32 seconds, 1 = f64 seconds, 2 = u32 nanoseconds,
    3 = pre-filter point index (for column-derived time recompute),
    -1 = no per-point time (times are zeros).
    """
    lib = _get_lib()
    ox, oy, oz = xyz_offsets
    if lib is not None:
        buf = np.frombuffer(blob, dtype=np.uint8)
        dirs = np.empty((3, n_points), np.float32)
        ranges = np.empty(n_points, np.float32)
        times = np.empty(n_points, np.float64)
        m = lib.decode_point_blob(
            buf.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(n_points),
            ctypes.c_int32(point_step),
            ctypes.c_int32(ox),
            ctypes.c_int32(oy),
            ctypes.c_int32(oz),
            ctypes.c_int32(time_offset),
            ctypes.c_int32(time_kind),
            ctypes.c_float(min_range),
            dirs.ctypes.data_as(ctypes.c_void_p),
            ranges.ctypes.data_as(ctypes.c_void_p),
            times.ctypes.data_as(ctypes.c_void_p),
        )
        return dirs[:, :m].copy(), ranges[:m].copy(), times[:m].copy()

    # numpy fallback
    rec = np.frombuffer(blob, dtype=np.uint8).reshape(n_points, point_step)
    xyz = np.stack(
        [rec[:, o : o + 4].copy().view(np.float32)[:, 0] for o in (ox, oy, oz)], axis=0
    )
    r = np.linalg.norm(xyz, axis=0)
    if time_kind == 0:
        t = rec[:, time_offset : time_offset + 4].copy().view(np.float32)[:, 0].astype(np.float64)
    elif time_kind == 1:
        t = rec[:, time_offset : time_offset + 8].copy().view(np.float64)[:, 0]
    elif time_kind == 2:
        t = rec[:, time_offset : time_offset + 4].copy().view(np.uint32)[:, 0] * 1e-9
    elif time_kind == 3:
        t = np.arange(n_points, dtype=np.float64)
    else:
        t = np.zeros(n_points)
    keep = np.isfinite(r) & (r > min_range)
    r_safe = np.maximum(r, 1e-12)
    return (xyz / r_safe)[:, keep].astype(np.float32), r[keep].astype(np.float32), t[keep]


def voxel_downsample_native(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """C++ voxel-average downsampling; numpy fallback via ops.voxel."""
    lib = _get_lib()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    if lib is not None and pts.shape[0] > 0:
        out = np.empty_like(pts)
        n_out = lib.voxel_downsample(
            pts.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(pts.shape[0]),
            ctypes.c_float(voxel_size),
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out[:n_out].copy()
    from loner_tpu.ops.voxel import voxel_downsample

    return voxel_downsample(pts, voxel_size)


def fov_mask_native(dirs: np.ndarray, ranges_deg) -> np.ndarray:
    """(3, N) dirs + [[lo, hi], ...] degrees -> (N,) bool keep mask."""
    lib = _get_lib()
    d = np.ascontiguousarray(dirs, dtype=np.float32)
    n = d.shape[1]
    flat = np.ascontiguousarray(np.asarray(ranges_deg, np.float32).reshape(-1))
    if lib is not None:
        keep = np.empty(n, np.uint8)
        lib.fov_mask(
            d.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(n),
            flat.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int32(flat.shape[0] // 2),
            keep.ctypes.data_as(ctypes.c_void_p),
        )
        return keep.astype(bool)
    az = np.rad2deg(np.arctan2(d[1], d[0])) % 360.0
    keep = np.zeros(n, bool)
    for lo, hi in np.asarray(ranges_deg).reshape(-1, 2):
        keep |= (az >= lo) & (az <= hi)
    return keep
