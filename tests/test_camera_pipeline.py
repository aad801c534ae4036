"""Tests for the camera-mode frame synthesis and sequence-config loading."""
import os
import sys
import textwrap

import numpy as np

from loner_tpu.common.pose import Pose
from loner_tpu.common.sensors import Image, LidarScan
from loner_tpu.common.settings import Settings
from loner_tpu.tracking.frame_synthesis import FrameSynthesis


def _scan(t0, n=16):
    return LidarScan(
        np.ones((3, n), np.float32) / np.sqrt(3),
        np.ones(n, np.float32),
        np.linspace(t0, t0 + 0.09, n),
    )


def _settings():
    return Settings(
        {
            "frame_decimation_rate_hz": 5,
            "frame_match_tolerance": 0.01,
            "frame_delta_t_sec_tolerance": 0.02,
            "decimate_on_load": False,
        }
    )


class TestCameraMatching:
    def test_image_matched_to_covering_scan(self):
        fs = FrameSynthesis(_settings(), Pose.identity(), lidar_only=False)
        img = Image(np.zeros((4, 4, 3), np.float32), timestamp=1.05)
        fs.process_image(img)
        assert not fs.has_frame()  # no scan yet
        fs.process_lidar(_scan(1.0), Pose.identity())
        assert fs.has_frame()
        frame = fs.pop_frame()
        assert frame.image is not None
        assert len(frame.lidar_points) == 16

    def test_image_before_all_scans_skipped(self):
        fs = FrameSynthesis(_settings(), Pose.identity(), lidar_only=False)
        img = Image(np.zeros((2, 2, 3), np.float32), timestamp=0.5)
        fs.process_image(img)
        fs.process_lidar(_scan(2.0), Pose.identity())  # starts after image
        assert not fs.has_frame()  # image dropped, not matched

    def test_image_waits_for_future_scan(self):
        fs = FrameSynthesis(_settings(), Pose.identity(), lidar_only=False)
        fs.process_lidar(_scan(1.0), Pose.identity())
        img = Image(np.zeros((2, 2, 3), np.float32), timestamp=2.05)
        fs.process_image(img)
        assert not fs.has_frame()
        fs.process_lidar(_scan(2.0), Pose.identity())
        assert fs.has_frame()


class TestSequenceConfig:
    def test_baseline_plus_changes(self, tmp_path):
        base = tmp_path / "base.yaml"
        base.write_text("a:\n  b: 1\n  c: 2\n")
        seq = tmp_path / "seq.yaml"
        seq.write_text(
            textwrap.dedent(
                """
                baseline: base.yaml
                dataset: /data/somewhere
                changes:
                  a:
                    b: 99
                """
            )
        )
        # Replicate run_loner.py's sequence-config handling.
        import yaml

        raw = yaml.safe_load(seq.read_text())
        assert "baseline" in raw
        from loner_tpu.common.settings import generate_options

        opts, _ = generate_options(
            str(tmp_path / raw["baseline"]), None, augmentations=[raw.get("changes")]
        )
        assert opts[0].a.b == 99
        assert opts[0].a.c == 2
