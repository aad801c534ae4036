#!/usr/bin/env python3
"""Convert a ROS bag (PointCloud2 + optional TF ground truth) into the
loner_tpu scan-stream format.

Counterpart of the reference's in-loop rosbag ingest
(examples/run_loner.py:59-157, 281-328): runs ONCE per dataset instead of
per run, applying the same timestamp heuristics. Bags are read with the
built-in pure-Python ROS1 v2.0 reader
(loner_tpu.datasets.rosbag_reader) — no ROS environment needed.

Usage:
    python examples/convert_rosbag.py input.bag out_dir \
        --lidar_topic /os_cloud_node/points \
        [--gt_topic /tf --gt_frame body]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from loner_tpu.datasets.scan_stream import (
    ScanStreamWriter,
    normalize_timestamps,
    recompute_scan_timestamps,
)
from loner_tpu.common.sensors import LidarScan
from loner_tpu.ops.native import decode_point_blob


def field_layout(msg):
    """Extract xyz + time field offsets from a PointCloud2 message."""
    offsets = {f.name: (f.offset, f.datatype) for f in msg.fields}
    ox, oy, oz = offsets["x"][0], offsets["y"][0], offsets["z"][0]
    t_off, t_kind = -1, -1
    for name in ("t", "time", "timestamp", "time_stamp"):
        if name in offsets:
            off, dtype = offsets[name]
            # sensor_msgs/PointField: 7=FLOAT32, 8=FLOAT64, 6=UINT32
            t_off = off
            t_kind = {7: 0, 8: 1, 6: 2}.get(dtype, -1)
            break
    return ox, oy, oz, t_off, t_kind


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("bag")
    parser.add_argument(
        "out_dir", nargs="?", default=None,
        help="output stream dir (default: the sequence config's `dataset` key)",
    )
    parser.add_argument(
        "--config", default=None,
        help="sequence yaml (e.g. cfg/fusion_portable/canteen.yaml): "
        "pre-fills out_dir from `dataset`, --gt_file from "
        "`groundtruth_traj`, and applies `dataset_family` heuristics "
        "(fusion_portable -> --recompute_timestamps; reference consumes "
        "the same keys in examples/run_loner.py:186,219-226,275)",
    )
    parser.add_argument("--lidar_topic", default="/os_cloud_node/points")
    parser.add_argument("--gt_file", default=None, help="TUM ground-truth file to copy")
    parser.add_argument(
        "--gt_topic", default=None,
        help="TF topic carrying ground-truth poses (e.g. /tf)",
    )
    parser.add_argument(
        "--gt_frame", default=None,
        help="child frame to extract from --gt_topic (default: all)",
    )
    parser.add_argument("--min_range", type=float, default=0.3)
    parser.add_argument(
        "--timestamps_relative_to_start", action="store_true", default=True
    )
    parser.add_argument(
        "--recompute_timestamps", action="store_true",
        help="rebuild per-point times from column index (Fusion Portable "
             "fix, reference run_loner.py:103-108)",
    )
    args = parser.parse_args()

    if args.config:
        from loner_tpu.common.settings import Settings

        seq = Settings.load_from_file(args.config)
        if args.out_dir is None and "dataset" in seq:
            args.out_dir = os.path.expanduser(str(seq["dataset"]))
        if args.gt_file is None and seq.get("groundtruth_traj"):
            gt = os.path.expanduser(str(seq["groundtruth_traj"]))
            if os.path.exists(gt):
                args.gt_file = gt
            else:
                print(f"warning: groundtruth_traj {gt} not found; skipping GT copy")
        if seq.get("dataset_family") == "fusion_portable":
            # Fusion Portable ouster bags need the column-derived
            # per-point time fix (reference run_loner.py:103-108,275).
            args.recompute_timestamps = True
    if args.out_dir is None:
        parser.error("out_dir is required (or pass --config with a `dataset` key)")

    from loner_tpu.datasets.rosbag_reader import Bag

    topics = [args.lidar_topic] + ([args.gt_topic] if args.gt_topic else [])
    writer = ScanStreamWriter(args.out_dir, meta={"source_bag": os.path.basename(args.bag)})
    count = 0
    gt_rows = []
    with Bag(args.bag) as bag:
        for topic, msg, ts in bag.read_messages(topics=topics):
            if args.gt_topic and topic == args.gt_topic:
                for tf in msg.transforms:
                    if args.gt_frame and tf.child_frame_id != args.gt_frame:
                        continue
                    tr, q = tf.transform.translation, tf.transform.rotation
                    gt_rows.append(
                        (tf.header.stamp.to_sec(), tr.x, tr.y, tr.z, q.x, q.y, q.z, q.w)
                    )
                continue
            scan_time = msg.header.stamp.to_sec()
            ox, oy, oz, t_off, t_kind = field_layout(msg)
            if args.recompute_timestamps:
                # Column-derived time fix: decode in index mode (times
                # carry each kept point's PRE-filter index, matching the
                # reference's full-array indexing, run_loner.py:103-108).
                t_off, t_kind = 0, 3
            dirs, ranges, times = decode_point_blob(
                bytes(msg.data),
                msg.width * msg.height,
                msg.point_step,
                (ox, oy, oz),
                time_offset=t_off,
                time_kind=t_kind,
                min_range=args.min_range,
            )
            if args.recompute_timestamps:
                # Organized clouds carry the true column count in width;
                # the 2048 default matches the Fusion Portable ouster
                # (reference run_loner.py:105).
                h_res = int(msg.width) if int(msg.height) > 1 else 2048
                times = recompute_scan_timestamps(times, h_resolution=h_res)
            times = normalize_timestamps(
                times, scan_time, args.timestamps_relative_to_start
            )
            order = np.argsort(times)
            writer.add_scan(LidarScan(dirs[:, order], ranges[order], times[order]))
            count += 1

    if args.gt_file:
        import shutil

        shutil.copy(args.gt_file, os.path.join(args.out_dir, "poses_gt.tum"))
    elif gt_rows:
        gt_rows.sort()
        with open(os.path.join(args.out_dir, "poses_gt.tum"), "w") as f:
            for row in gt_rows:
                f.write(" ".join(f"{v:.9f}" for v in row) + "\n")
    print(f"Converted {count} scans to {args.out_dir}")


if __name__ == "__main__":
    main()
