"""ROS1 bag ingest: pure-Python reader + PointCloud2 decode + converter.

The fixture writes a spec-compliant ROS1 v2.0 bag byte-by-byte from the
public format documentation (magic, length-prefixed header fields, chunk
records with none/bz2 compression, connection records, message-data
records) — independent of the reader's internals — then drives the full
path the reference exercises per run (examples/run_loner.py:59-157):
bag -> PointCloud2 blob -> LidarScan -> scan-stream dataset.
"""
import os
import struct
import sys

import numpy as np
import pytest

from loner_tpu.datasets.rosbag_reader import Bag, bag_topics


# ---------------------------------------------------------------------------
# Minimal spec-faithful bag writer (test fixture, not production code)
# ---------------------------------------------------------------------------

def _hfield(name: bytes, value: bytes) -> bytes:
    entry = name + b"=" + value
    return struct.pack("<I", len(entry)) + entry


def _record(fields: dict, data: bytes) -> bytes:
    header = b"".join(_hfield(k, v) for k, v in fields.items())
    return struct.pack("<I", len(header)) + header + struct.pack("<I", len(data)) + data


def _ros_string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<I", len(b)) + b


def _ros_header(seq: int, secs: int, nsecs: int, frame: str) -> bytes:
    return struct.pack("<III", seq, secs, nsecs) + _ros_string(frame)


def _pointcloud2_bytes(secs, nsecs, xyz: np.ndarray, point_times: np.ndarray) -> bytes:
    """Serialize sensor_msgs/PointCloud2 with x,y,z,t fields (f32)."""
    n = xyz.shape[0]
    point_step = 16
    blob = np.zeros((n, 4), np.float32)
    blob[:, :3] = xyz
    blob[:, 3] = point_times
    payload = blob.tobytes()
    fields = [("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1), ("t", 12, 7, 1)]
    out = _ros_header(0, secs, nsecs, "lidar")
    out += struct.pack("<II", 1, n)  # height, width
    out += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        out += _ros_string(name) + struct.pack("<IBI", off, dt, cnt)
    out += struct.pack("<B", 0)  # is_bigendian
    out += struct.pack("<II", point_step, point_step * n)
    out += struct.pack("<I", len(payload)) + payload
    out += struct.pack("<B", 1)  # is_dense
    return out


def _tf_bytes(secs, nsecs, child: str, xyz, quat) -> bytes:
    out = struct.pack("<I", 1)  # one transform
    out += _ros_header(0, secs, nsecs, "map")
    out += _ros_string(child)
    out += struct.pack("<3d", *xyz)
    out += struct.pack("<4d", *quat)
    return out


def _connection_record(conn_id: int, topic: str, msg_type: str) -> bytes:
    conn_header = (
        _hfield(b"topic", topic.encode())
        + _hfield(b"type", msg_type.encode())
        + _hfield(b"md5sum", b"0" * 32)
        + _hfield(b"message_definition", b"")
    )
    return _record(
        {b"op": b"\x07", b"conn": struct.pack("<I", conn_id),
         b"topic": topic.encode()},
        conn_header,
    )


def _message_record(conn_id: int, secs: int, nsecs: int, payload: bytes) -> bytes:
    return _record(
        {b"op": b"\x02", b"conn": struct.pack("<I", conn_id),
         b"time": struct.pack("<II", secs, nsecs)},
        payload,
    )


def write_fixture_bag(path: str, compression: str = "none") -> dict:
    """Two PointCloud2 scans + two TF poses, in one chunk."""
    rng = np.random.default_rng(0)
    scans = []
    chunk = _connection_record(0, "/os_cloud_node/points", "sensor_msgs/PointCloud2")
    chunk += _connection_record(1, "/tf", "tf2_msgs/TFMessage")
    t0 = 1_600_000_000
    for i in range(2):
        n = 64
        xyz = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        pt_times = np.linspace(0, 0.1, n).astype(np.float32)  # scan-local secs
        scans.append((xyz, pt_times))
        chunk += _message_record(
            0, t0 + i, 0, _pointcloud2_bytes(t0 + i, 0, xyz, pt_times)
        )
        chunk += _message_record(
            1, t0 + i, 0,
            _tf_bytes(t0 + i, 0, "body", (float(i), 0.0, 0.5), (0, 0, 0, 1)),
        )

    if compression == "bz2":
        import bz2 as _bz2

        cdata = _bz2.compress(chunk)
    else:
        cdata = chunk
    chunk_record = _record(
        {b"op": b"\x05", b"compression": compression.encode(),
         b"size": struct.pack("<I", len(chunk))},
        cdata,
    )
    bag_header = _record(
        {b"op": b"\x03", b"index_pos": struct.pack("<Q", 0),
         b"conn_count": struct.pack("<I", 2),
         b"chunk_count": struct.pack("<I", 1)},
        b" " * 4096,
    )
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n" + bag_header + chunk_record)
    return {"scans": scans, "t0": t0}


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_reader_roundtrip(tmp_path, compression):
    path = str(tmp_path / "test.bag")
    truth = write_fixture_bag(path, compression)

    assert bag_topics(path) == {
        "/os_cloud_node/points": "sensor_msgs/PointCloud2",
        "/tf": "tf2_msgs/TFMessage",
    }

    clouds, tfs = [], []
    with Bag(path) as bag:
        for topic, msg, ts in bag.read_messages():
            (clouds if topic == "/os_cloud_node/points" else tfs).append((msg, ts))

    assert len(clouds) == 2 and len(tfs) == 2
    msg, ts = clouds[0]
    assert msg.width == 64 and msg.point_step == 16
    assert [f.name for f in msg.fields] == ["x", "y", "z", "t"]
    assert msg.header.stamp.to_sec() == truth["t0"]
    blob = np.frombuffer(msg.data, np.float32).reshape(-1, 4)
    np.testing.assert_allclose(blob[:, :3], truth["scans"][0][0])
    tf_msg, _ = tfs[1]
    assert tf_msg.transforms[0].child_frame_id == "body"
    assert tf_msg.transforms[0].transform.translation.x == 1.0


def test_convert_rosbag_end_to_end(tmp_path, monkeypatch):
    """bag -> convert_rosbag CLI -> scan-stream dataset + TUM ground truth."""
    bag_path = str(tmp_path / "seq.bag")
    truth = write_fixture_bag(bag_path)
    out_dir = str(tmp_path / "converted")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import convert_rosbag

    monkeypatch.setattr(
        sys, "argv",
        ["convert_rosbag.py", bag_path, out_dir,
         "--gt_topic", "/tf", "--gt_frame", "body", "--min_range", "0.0"],
    )
    convert_rosbag.main()

    from loner_tpu.datasets.scan_stream import ScanStreamReader

    reader = ScanStreamReader(out_dir)
    assert len(reader) == 2
    scan = reader.read_scan(0)
    xyz = truth["scans"][0][0]
    expect_ranges = np.linalg.norm(xyz, axis=-1)
    # Scans are re-sorted by per-point time; fixture times are already
    # sorted, so order is preserved.
    np.testing.assert_allclose(scan.distances, expect_ranges, rtol=1e-5)
    np.testing.assert_allclose(
        scan.ray_directions * scan.distances[None, :], xyz.T, rtol=1e-4, atol=1e-5
    )
    assert np.all(np.diff(scan.timestamps) >= 0)

    gt = np.loadtxt(os.path.join(out_dir, "poses_gt.tum"))
    assert gt.shape == (2, 8)
    np.testing.assert_allclose(gt[1, 1], 1.0)  # x of second pose


def _ouster_pointcloud2_bytes(secs, nsecs, xyz: np.ndarray,
                              t_ns: np.ndarray, height: int) -> bytes:
    """Serialize an Ouster-style PointCloud2: organized (height > 1),
    48-byte stride, fields x,y,z f32 + intensity f32 + t UINT32 ns +
    reflectivity u16 + ring u8 + range u32 at the real driver offsets."""
    n = xyz.shape[0]
    point_step = 48
    blob = np.zeros((n, point_step), np.uint8)
    blob[:, 0:12] = xyz.astype(np.float32).view(np.uint8).reshape(n, 12)
    blob[:, 16:20] = (
        np.full(n, 100.0, np.float32).view(np.uint8).reshape(n, 4)
    )  # intensity
    blob[:, 20:24] = t_ns.astype(np.uint32).view(np.uint8).reshape(n, 4)
    blob[:, 26:27] = (np.arange(n) % height).astype(np.uint8).reshape(n, 1)
    payload = blob.tobytes()
    fields = [
        ("x", 0, 7, 1), ("y", 4, 7, 1), ("z", 8, 7, 1),
        ("intensity", 16, 7, 1), ("t", 20, 6, 1),
        ("reflectivity", 24, 4, 1), ("ring", 26, 2, 1), ("range", 28, 6, 1),
    ]
    out = _ros_header(0, secs, nsecs, "os_sensor")
    out += struct.pack("<II", height, n // height)  # height, width
    out += struct.pack("<I", len(fields))
    for name, off, dt, cnt in fields:
        out += _ros_string(name) + struct.pack("<IBI", off, dt, cnt)
    out += struct.pack("<B", 0)
    out += struct.pack("<II", point_step, point_step * (n // height))
    out += struct.pack("<I", len(payload)) + payload
    out += struct.pack("<B", 1)
    return out


def write_ouster_bag(path: str, n_scans: int = 2, height: int = 4,
                     width: int = 64) -> dict:
    """Realistic Ouster-layout bag: organized clouds, u32-ns per-point
    times, extra fields the decoder must skip over."""
    rng = np.random.default_rng(3)
    scans = []
    chunk = _connection_record(0, "/os_cloud_node/points", "sensor_msgs/PointCloud2")
    t0 = 1_700_000_000
    for i in range(n_scans):
        n = height * width
        xyz = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
        # Column-major sweep times: column c fires at c/width * 0.1 s.
        cols = np.arange(n) // height
        t_ns = (cols / width * 0.1 * 1e9).astype(np.uint32)
        scans.append((xyz, t_ns))
        chunk += _message_record(
            0, t0 + i, 0,
            _ouster_pointcloud2_bytes(t0 + i, 0, xyz, t_ns, height),
        )
    chunk_record = _record(
        {b"op": b"\x05", b"compression": b"none",
         b"size": struct.pack("<I", len(chunk))},
        chunk,
    )
    bag_header = _record(
        {b"op": b"\x03", b"index_pos": struct.pack("<Q", 0),
         b"conn_count": struct.pack("<I", 1),
         b"chunk_count": struct.pack("<I", 1)},
        b" " * 4096,
    )
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n" + bag_header + chunk_record)
    return {"scans": scans, "t0": t0}


def test_convert_ouster_layout_end_to_end(tmp_path, monkeypatch):
    """Ouster-style bag (organized, 48-byte stride, u32-ns t, ring/
    reflectivity fields at real offsets) -> CLI -> scan stream."""
    bag_path = str(tmp_path / "ouster.bag")
    truth = write_ouster_bag(bag_path)
    out_dir = str(tmp_path / "converted")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import convert_rosbag

    monkeypatch.setattr(
        sys, "argv",
        ["convert_rosbag.py", bag_path, out_dir, "--min_range", "0.0"],
    )
    convert_rosbag.main()

    from loner_tpu.datasets.scan_stream import ScanStreamReader

    reader = ScanStreamReader(out_dir)
    assert len(reader) == 2
    scan = reader.read_scan(0)
    xyz, t_ns = truth["scans"][0]
    assert len(scan) == xyz.shape[0]
    # u32-ns per-point times decode to seconds anchored at the header.
    assert np.all(np.diff(scan.timestamps) >= 0)
    np.testing.assert_allclose(
        scan.timestamps.max() - scan.timestamps.min(),
        (t_ns.max() - t_ns.min()) * 1e-9,
        rtol=1e-5,
    )
    np.testing.assert_allclose(scan.timestamps.min(), truth["t0"], atol=1e-6)
    # Ranges survive the 48-byte-stride decode (sorted by time, so
    # compare as multisets).
    np.testing.assert_allclose(
        np.sort(scan.distances),
        np.sort(np.linalg.norm(xyz, axis=-1)),
        rtol=1e-5,
    )


def test_convert_rosbag_config_driven(tmp_path, monkeypatch):
    """--config consumes the sequence yaml's dataset / groundtruth_traj /
    dataset_family keys (the reference reads the same keys in its live
    ingest, examples/run_loner.py:186,219-226,275)."""
    bag_path = str(tmp_path / "seq.bag")
    write_fixture_bag(bag_path)
    out_dir = str(tmp_path / "converted_cfg")
    gt_file = tmp_path / "gt.tum"
    gt_file.write_text("0.0 0 0 0 0 0 0 1\n1.0 1 0 0 0 0 0 1\n")
    cfg = tmp_path / "seq.yaml"
    cfg.write_text(
        f"dataset: {out_dir}\n"
        f"groundtruth_traj: {gt_file}\n"
        "dataset_family: generic\n"
    )

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))
    import convert_rosbag

    monkeypatch.setattr(
        sys, "argv",
        ["convert_rosbag.py", bag_path, "--config", str(cfg), "--min_range", "0.0"],
    )
    convert_rosbag.main()

    from loner_tpu.datasets.scan_stream import ScanStreamReader

    reader = ScanStreamReader(out_dir)
    assert len(reader) == 2
    gt = np.loadtxt(os.path.join(out_dir, "poses_gt.tum"))
    assert gt.shape == (2, 8)  # copied from groundtruth_traj
