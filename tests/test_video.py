"""MJPEG/AVI assembly (analysis/video.py) — the in-process replacement for
the reference's OpenCV VideoWriter flythrough output (reference
analysis/renderer.py:322-480)."""

import io
import os

import numpy as np
import pytest

from loner_tpu.analysis.video import (
    extract_first_jpeg,
    read_avi_frame_count,
    write_mjpeg_avi,
)


def _gradient_frames(n=6, h=32, w=48):
    frames = []
    for i in range(n):
        y, x = np.meshgrid(
            np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij"
        )
        img = np.stack([np.full_like(y, i / max(n - 1, 1)), y, x], axis=-1) / 2.0
        frames.append(img.astype(np.float32))
    return frames


class TestMjpegAvi:
    def test_roundtrip_structure(self, tmp_path):
        frames = _gradient_frames()
        path = str(tmp_path / "clip.avi")
        write_mjpeg_avi(path, frames, fps=12)
        n, (h, w), fps = read_avi_frame_count(path)
        assert n == len(frames)
        assert (h, w) == frames[0].shape[:2]
        assert fps == 12

    def test_first_frame_decodes_close(self, tmp_path):
        PIL = pytest.importorskip("PIL")
        from PIL import Image

        frames = _gradient_frames()
        path = str(tmp_path / "clip.avi")
        write_mjpeg_avi(path, frames, fps=10, quality=95)
        jpeg = extract_first_jpeg(path)
        decoded = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"))
        expected = (np.clip(frames[0], 0, 1) * 255 + 0.5).astype(np.uint8)
        assert decoded.shape == expected.shape
        # JPEG is lossy; gradients should survive to within a few counts.
        assert np.mean(np.abs(decoded.astype(float) - expected.astype(float))) < 6.0

    def test_accepts_file_paths_and_grayscale(self, tmp_path):
        from PIL import Image

        paths = []
        for i in range(3):
            img = (np.full((16, 16), 40 * i, dtype=np.uint8))
            p = str(tmp_path / f"f{i}.png")
            Image.fromarray(img, mode="L").save(p)
            paths.append(p)
        out = str(tmp_path / "gray.avi")
        write_mjpeg_avi(out, paths, fps=5)
        n, (h, w), _ = read_avi_frame_count(out)
        assert n == 3 and (h, w) == (16, 16)

    def test_resolution_mismatch_raises(self, tmp_path):
        frames = [np.zeros((8, 8, 3), np.uint8), np.zeros((8, 10, 3), np.uint8)]
        with pytest.raises(ValueError, match="resolution"):
            write_mjpeg_avi(str(tmp_path / "bad.avi"), frames)

    def test_empty_raises(self, tmp_path):
        with pytest.raises(ValueError, match="no frames"):
            write_mjpeg_avi(str(tmp_path / "empty.avi"), [])

    def test_opencv_decodes_container(self, tmp_path):
        """Independent oracle: a third-party decoder (OpenCV) must open the
        container and read back every frame at the declared fps."""
        cv2 = pytest.importorskip("cv2")
        frames = [
            np.random.default_rng(i).integers(0, 255, (32, 48, 3), dtype=np.uint8)
            for i in range(5)
        ]
        path = str(tmp_path / "oracle.avi")
        write_mjpeg_avi(path, frames, fps=10)
        cap = cv2.VideoCapture(path)
        got = 0
        ok, first = cap.read()
        while ok:
            got += 1
            ok, _ = cap.read()
        assert got == 5
        assert first.shape == (32, 48, 3)
        assert cap.get(cv2.CAP_PROP_FPS) == pytest.approx(10.0)

    def test_riff_sizes_exact(self, tmp_path):
        """Byte-level container validity: RIFF size field == file size - 8,
        and every chunk boundary is even-aligned (players hard-require
        this)."""
        frames = _gradient_frames(n=2, h=9, w=11)  # odd sizes → padding paths
        path = str(tmp_path / "odd.avi")
        write_mjpeg_avi(path, frames, fps=10)
        read_avi_frame_count(path)  # raises on size mismatch / bad idx1
        assert os.path.getsize(path) % 2 == 0

    def test_single_channel_3d_frames(self, tmp_path):
        # Docstring-allowed (H, W, 1) shape must encode like grayscale.
        frames = [np.full((16, 24, 1), 60 * i, dtype=np.uint8) for i in range(3)]
        out = str(tmp_path / "c1.avi")
        write_mjpeg_avi(out, frames, fps=5)
        n, (h, w), _ = read_avi_frame_count(out)
        assert n == 3 and (h, w) == (16, 24)
