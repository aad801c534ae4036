"""Tests for the C++ native ops vs their numpy fallbacks."""
import struct

import numpy as np
import pytest

from loner_tpu.ops.native import (
    decode_point_blob,
    fov_mask_native,
    native_available,
    voxel_downsample_native,
)
from loner_tpu.ops.voxel import voxel_downsample


def make_blob(points, times=None, point_step=22):
    """Interleaved records: x,y,z f32 at 0/4/8, t f32 at 12, pad to step."""
    out = bytearray()
    for i, p in enumerate(points):
        rec = struct.pack("<fff", *p)
        rec += struct.pack("<f", 0.0 if times is None else times[i])
        rec += b"\x00" * (point_step - len(rec))
        out += rec
    return bytes(out)


class TestDecode:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(100, 3)) * 5
        times = np.linspace(0, 0.1, 100).astype(np.float32)
        blob = make_blob(pts, times)
        dirs, ranges, ts = decode_point_blob(
            blob, 100, 22, (0, 4, 8), time_offset=12, time_kind=0, min_range=0.0
        )
        expected_r = np.linalg.norm(pts, axis=1)
        np.testing.assert_allclose(ranges, expected_r, rtol=1e-5)
        np.testing.assert_allclose(dirs * ranges, pts.T, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(ts, times, atol=1e-6)

    def test_min_range_and_nan_filter(self):
        pts = np.array([[0.05, 0, 0], [np.nan, 1, 1], [3, 0, 0]])
        blob = make_blob(pts)
        dirs, ranges, _ = decode_point_blob(
            blob, 3, 22, (0, 4, 8), min_range=0.3
        )
        assert ranges.shape == (1,)
        assert ranges[0] == pytest.approx(3.0)

    def test_native_built(self):
        # The toolchain is baked into this image; the native path must load.
        assert native_available()


class TestVoxelNative:
    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-2, 2, (5000, 3)).astype(np.float32)
        a = voxel_downsample_native(pts, 0.25)
        b = voxel_downsample(pts, 0.25)
        assert a.shape == b.shape
        # Same voxel set -> same centroids up to ordering.
        a_sorted = a[np.lexsort(a.T)]
        b_sorted = b[np.lexsort(b.T)]
        np.testing.assert_allclose(a_sorted, b_sorted, atol=1e-5)


class TestFovMask:
    def test_windows(self):
        angles = np.deg2rad([0, 45, 90, 180, 270, 359])
        dirs = np.stack([np.cos(angles), np.sin(angles), np.zeros(6)])
        keep = fov_mask_native(dirs, [[0, 100], [350, 360]])
        np.testing.assert_array_equal(keep, [True, True, True, False, False, True])
