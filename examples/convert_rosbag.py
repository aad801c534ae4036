#!/usr/bin/env python3
"""Convert a ROS bag (PointCloud2 + optional TF ground truth) into the
loner_tpu scan-stream format.

Counterpart of the reference's in-loop rosbag ingest
(examples/run_loner.py:59-157, 281-328): runs ONCE per dataset instead of
per run, applying the same timestamp heuristics. Requires the `rosbag`
python package (available inside a ROS environment); the SLAM framework
itself has zero ROS dependency.

Usage:
    python examples/convert_rosbag.py input.bag out_dir \
        --lidar_topic /os_cloud_node/points [--gt_topic /tf ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from loner_tpu.datasets.scan_stream import ScanStreamWriter, normalize_timestamps
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
    parser.add_argument("out_dir")
    parser.add_argument("--lidar_topic", default="/os_cloud_node/points")
    parser.add_argument("--gt_file", default=None, help="TUM ground-truth file to copy")
    parser.add_argument("--min_range", type=float, default=0.3)
    parser.add_argument(
        "--timestamps_relative_to_start", action="store_true", default=True
    )
    args = parser.parse_args()

    try:
        import rosbag  # type: ignore
    except ImportError:
        sys.exit(
            "rosbag is not available in this environment. Run this converter "
            "inside a ROS environment, or write scans directly with "
            "loner_tpu.datasets.scan_stream.ScanStreamWriter."
        )

    writer = ScanStreamWriter(args.out_dir, meta={"source_bag": os.path.basename(args.bag)})
    bag = rosbag.Bag(args.bag)
    count = 0
    for topic, msg, ts in bag.read_messages(topics=[args.lidar_topic]):
        scan_time = msg.header.stamp.to_sec()
        ox, oy, oz, t_off, t_kind = field_layout(msg)
        dirs, ranges, times = decode_point_blob(
            bytes(msg.data),
            msg.width * msg.height,
            msg.point_step,
            (ox, oy, oz),
            time_offset=t_off,
            time_kind=t_kind,
            min_range=args.min_range,
        )
        times = normalize_timestamps(
            times, scan_time, args.timestamps_relative_to_start
        )
        order = np.argsort(times)
        writer.add_scan(LidarScan(dirs[:, order], ranges[order], times[order]))
        count += 1
    bag.close()

    if args.gt_file:
        import shutil

        shutil.copy(args.gt_file, os.path.join(args.out_dir, "poses_gt.tum"))
    print(f"Converted {count} scans to {args.out_dir}")


if __name__ == "__main__":
    main()
