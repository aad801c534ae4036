"""Production bag writer -> reader -> converter, at realistic layouts.

The writer (loner_tpu/datasets/rosbag_writer.py) and reader
(rosbag_reader.py) are independent implementations of the ROS1 v2.0
format, so these round-trips actually check the container format:
multi-chunk streams, bz2 chunks, the index section, ring-major Ouster
organized clouds, and all three adversarial timestamp modes the
synthetic-bag drill generates (reference ingests the same properties
from real Fusion Portable / Newer College bags,
examples/run_loner.py:59-157).
"""
import importlib.util
import os
import sys

import numpy as np
import pytest

from loner_tpu.datasets.rosbag_reader import Bag, bag_topics
from loner_tpu.datasets.rosbag_writer import (
    BagWriter,
    ouster_blob,
    pointcloud2_bytes,
    tf_message_bytes,
    OUSTER_FIELDS,
    OUSTER_POINT_STEP,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_maker():
    spec = importlib.util.spec_from_file_location(
        "make_synthetic_bag",
        os.path.join(_REPO, "examples", "scripts", "make_synthetic_bag.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_writer_reader_roundtrip_multichunk(tmp_path, compression):
    """Many messages across several chunks; payloads and chronology
    survive; the index section doesn't confuse the sequential reader."""
    path = str(tmp_path / "multi.bag")
    n_msgs = 40
    rng = np.random.default_rng(0)
    payloads = []
    with BagWriter(path, compression=compression, chunk_bytes=4096) as w:
        w.add_connection("/pts", "sensor_msgs/PointCloud2")
        w.add_connection("/tf", "tf2_msgs/TFMessage")
        for i in range(n_msgs):
            t = 1000.0 + 0.1 * i
            xyz = rng.uniform(-5, 5, (16, 3)).astype(np.float32)
            t_ns = (np.arange(16) * 1000).astype(np.uint64)
            msg = pointcloud2_bytes(
                t, "lidar", 1, 16, OUSTER_FIELDS, OUSTER_POINT_STEP,
                ouster_blob(xyz, t_ns), seq=i,
            )
            w.write("/pts", msg, t)
            payloads.append(xyz)
            w.write(
                "/tf",
                tf_message_bytes(t, "map", "body", (i, 0, 0), (0, 0, 0, 1)),
                t,
            )
    # Several chunks must exist for this to test chunking at all.
    assert len(w._chunk_infos) > 3

    assert bag_topics(path) == {
        "/pts": "sensor_msgs/PointCloud2", "/tf": "tf2_msgs/TFMessage"
    }
    got_pts, got_tf = [], []
    with Bag(path) as bag:
        for topic, msg, ts in bag.read_messages():
            if topic == "/pts":
                got_pts.append((msg, ts.to_sec()))
            else:
                got_tf.append((msg, ts.to_sec()))
    assert len(got_pts) == n_msgs and len(got_tf) == n_msgs
    for i, (msg, t) in enumerate(got_pts):
        assert abs(t - (1000.0 + 0.1 * i)) < 1e-6
        blob = np.frombuffer(msg.data, np.uint8).reshape(-1, OUSTER_POINT_STEP)
        xyz = blob[:, :12].copy().view(np.float32).reshape(-1, 3)
        np.testing.assert_allclose(xyz, payloads[i], rtol=1e-6)
    x_tf = [m.transforms[0].transform.translation.x for m, _ in got_tf]
    np.testing.assert_allclose(x_tf, np.arange(n_msgs))


def _convert(bag_path, out_dir, extra, monkeypatch):
    sys.path.insert(0, os.path.join(_REPO, "examples"))
    import convert_rosbag

    monkeypatch.setattr(
        sys, "argv",
        ["convert_rosbag.py", bag_path, out_dir,
         "--gt_topic", "/tf", "--gt_frame", "body"] + extra,
    )
    convert_rosbag.main()


@pytest.mark.parametrize(
    "ts_mode,extra,span_lo,span_hi",
    [
        ("ouster_ns", [], 0.15, 0.21),
        ("epoch_f64", [], 0.15, 0.21),
        # The column-recompute fix assumes a 10 Hz sweep (reference
        # run_loner.py:103-108 hardcodes scan_period 0.1), so the
        # reconstructed span is 0.1 s even for this 5 Hz bag.
        ("zeros", ["--recompute_timestamps"], 0.05, 0.11),
    ],
)
def test_synthetic_bag_convert_e2e(tmp_path, monkeypatch, ts_mode, extra,
                                   span_lo, span_hi):
    """make_synthetic_bag -> convert_rosbag for every adversarial
    timestamp mode: scans come out sorted, globally-anchored, with the
    right per-sweep span, and points sit on the scene surfaces under the
    GT poses."""
    maker = _load_maker()
    bag_path = str(tmp_path / f"{ts_mode}.bag")
    monkeypatch.setattr(
        sys, "argv",
        ["make_synthetic_bag.py", bag_path, "--duration", "1", "--rate", "5",
         "--channels", "16", "--columns", "64", "--compression", "bz2",
         "--chunk_mb", "0.25", "--timestamp_mode", ts_mode,
         "--noise_std", "0"],
    )
    maker.main()
    assert os.path.exists(os.path.splitext(bag_path)[0] + "_gt.tum")

    out_dir = str(tmp_path / "stream")
    _convert(bag_path, out_dir, extra, monkeypatch)

    from loner_tpu.datasets.scan_stream import ScanStreamReader

    r = ScanStreamReader(out_dir)
    assert len(r) == 5
    epoch = 1.7e9
    for i in range(5):
        s = r.read_scan(i)
        assert s.distances.shape[0] > 0.9 * 16 * 64  # few dropped returns
        assert np.all(np.diff(s.timestamps) >= 0)
        # Globally anchored to the header stamp...
        assert abs(s.timestamps[0] - (epoch + i / 5.0)) < 0.01
        # ...with a real intra-sweep span (at 5 Hz the generator sweeps
        # the full 0.2 s inter-scan period; 64 columns).
        span = s.timestamps[-1] - s.timestamps[0]
        assert span_lo < span < span_hi, span

    # Geometric ground truth: scan points under the GT pose lie on the
    # room/obstacle surfaces.
    gi = r.gt_interpolator
    gi = gi() if callable(gi) else gi
    s = r.read_scan(2)
    pose = gi.at(float(np.median(s.timestamps)))
    pts = pose.transform_points((s.ray_directions * s.distances).T)
    lo, hi = np.array([-8.0, -6.0, -2.0]), np.array([8.0, 6.0, 3.0])
    on_room = (np.abs(pts - lo) < 0.2).any(1) | (np.abs(pts - hi) < 0.2).any(1)
    on_obs = np.zeros(len(pts), bool)
    for bmin, bmax in (
        (np.array([2.0, -2.0, -2.0]), np.array([4.0, 0.0, 1.0])),
        (np.array([-5.0, 2.0, -2.0]), np.array([-3.0, 4.0, 0.5])),
    ):
        on_obs |= np.all((pts > bmin - 0.2) & (pts < bmax + 0.2), axis=1)
    assert (on_room | on_obs).mean() > 0.99


def test_unsorted_blob_times_get_sorted(tmp_path, monkeypatch):
    """Ring-major organized clouds store per-point times NON-monotonically
    (time = column, order = ring-major); the converter must sort."""
    maker = _load_maker()
    bag_path = str(tmp_path / "rm.bag")
    monkeypatch.setattr(
        sys, "argv",
        ["make_synthetic_bag.py", bag_path, "--duration", "0.4", "--rate", "5",
         "--channels", "4", "--columns", "16", "--compression", "none"],
    )
    maker.main()
    with Bag(bag_path) as bag:
        for topic, msg, ts in bag.read_messages(topics=["/os_cloud_node/points"]):
            blob = np.frombuffer(msg.data, np.uint8).reshape(-1, OUSTER_POINT_STEP)
            t_raw = blob[:, 20:24].copy().view(np.uint32).ravel()
            assert not np.all(np.diff(t_raw.astype(np.int64)) >= 0)
            break
