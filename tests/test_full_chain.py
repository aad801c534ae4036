"""The full real-data chain in ONE test: ROS1 bag bytes ->
convert_rosbag CLI -> run_loner SLAM -> metrics_pipeline ATE summary.

Rehearses every link a real Fusion-Portable-style bag would exercise
(reference examples/run_loner.py:59-157 ingest contract +
analysis/compute_metrics flow), so the day a real bag appears nothing
runs for the first time. The bag's PointCloud2 scans come from the
analytic box-room scene (trackable geometry, exact GT), written at the
byte level by the test_rosbag_ingest fixture helpers.
"""
import os
import sys

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from loner_tpu.datasets.synthetic import VirtualLidar, generate_sequence

from test_rosbag_ingest import (
    _connection_record,
    _message_record,
    _pointcloud2_bytes,
    _record,
    _tf_bytes,
)

# Suite tier (tests/conftest.py): full-pipeline drive, >30 s on CPU.
pytestmark = [pytest.mark.slow, pytest.mark.e2e]

NUM_SCANS = 24


def write_synthetic_scene_bag(path: str) -> int:
    """A ROS1 v2.0 bag of box-room scans + TF ground truth."""
    scans, poses, ts, _, _ = generate_sequence(
        num_scans=NUM_SCANS,
        lidar=VirtualLidar(num_channels=16, num_columns=128, max_range=30.0),
        rate_hz=5.0,
    )
    chunk = _connection_record(0, "/os_cloud_node/points", "sensor_msgs/PointCloud2")
    chunk += _connection_record(1, "/tf", "tf2_msgs/TFMessage")
    t_base = 1_600_000_000
    for i, scan in enumerate(scans):
        rel = ts[i] - ts[0]
        secs = t_base + int(rel)
        nsecs = int((rel - int(rel)) * 1e9)
        xyz = (scan.ray_directions * scan.distances[None, :]).T.astype(np.float32)
        pt_times = (scan.timestamps - scan.timestamps[0]).astype(np.float32)
        chunk += _message_record(
            0, secs, nsecs, _pointcloud2_bytes(secs, nsecs, xyz, pt_times)
        )
        quat = Rotation.from_matrix(poses[i][:3, :3]).as_quat()
        chunk += _message_record(
            1, secs, nsecs,
            _tf_bytes(secs, nsecs, "body", tuple(poses[i][:3, 3]), tuple(quat)),
        )
    import struct

    chunk_record = _record(
        {b"op": b"\x05", b"compression": b"none",
         b"size": struct.pack("<I", len(chunk))},
        chunk,
    )
    bag_header = _record(
        {b"op": b"\x03", b"index_pos": struct.pack("<Q", 0),
         b"conn_count": struct.pack("<I", 2),
         b"chunk_count": struct.pack("<I", 1)},
        b" " * 4096,
    )
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n" + bag_header + chunk_record)
    return NUM_SCANS


def test_bag_bytes_to_ate_yaml(tmp_path, monkeypatch):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

    # 1. bag bytes -> scan-stream dataset (convert_rosbag CLI).
    bag_path = str(tmp_path / "scene.bag")
    write_synthetic_scene_bag(bag_path)
    dataset_dir = str(tmp_path / "converted")
    import convert_rosbag

    monkeypatch.setattr(
        sys, "argv",
        ["convert_rosbag.py", bag_path, dataset_dir,
         "--gt_topic", "/tf", "--gt_frame", "body", "--min_range", "0.0"],
    )
    convert_rosbag.main()

    from loner_tpu.datasets.scan_stream import ScanStreamReader

    assert len(ScanStreamReader(dataset_dir)) == NUM_SCANS

    # 2. SLAM over the converted dataset (public CLI path).
    from run_loner import run_trial
    from test_e2e_slam import tiny_settings

    settings = tiny_settings(str(tmp_path / "outputs"))
    log_dir = run_trial(settings, dataset_dir, experiment_name="full_chain")

    # 3. Metrics pipeline -> ATE yaml + summary CSV.
    from loner_tpu.analysis.metrics_pipeline import (
        analyze_trajectories,
        summarize_results,
    )
    import yaml

    results = analyze_trajectories(log_dir, delta_m=1.0)
    assert results, "no trials found by the metrics pipeline"
    (trial_name, res), = results.items()
    assert "error" not in res, res
    assert res["ate"]["rmse"] < 0.15, res["ate"]

    ate_yaml = os.path.join(log_dir, "metrics", "ate.yaml")
    os.makedirs(os.path.dirname(ate_yaml), exist_ok=True)
    with open(ate_yaml, "w") as f:
        yaml.safe_dump({k: dict(v) for k, v in res.items()}, f)
    assert os.path.exists(ate_yaml)

    csv = summarize_results(
        results, out_csv=os.path.join(log_dir, "metrics", "summary.csv")
    )
    assert "ate_rmse_mean" in csv
    assert os.path.exists(os.path.join(log_dir, "metrics", "summary.csv"))
