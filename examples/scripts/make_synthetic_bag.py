#!/usr/bin/env python3
"""Generate a realistic, large, adversarial Ouster-style ROS1 bag.

Real-data readiness drill (the reference's entire results basis is
multi-GB Fusion Portable / Newer College ouster bags — reference
README.md:156-163): this script manufactures a bag with every property
that makes those bags hard to ingest, so the
convert_rosbag.py -> run_loner.py -> metrics chain can be exercised at
scale without network access:

- 128-channel x N-column ORGANIZED clouds at the real ouster_ros
  48-byte stride with intensity/reflectivity/ring/range fields the
  decoder must step over;
- RING-MAJOR point order (row-major organized cloud), so per-point
  times are NON-monotonic inside the blob and the converter must sort;
- u32 nanosecond scan-local per-point times (`--timestamp_mode
  ouster_ns`, the real driver), absolute epoch-second f64 times
  (`epoch_f64`, exercises the ns-vs-s heuristics), or all-zero times
  (`zeros`, forces the Fusion-Portable column-recompute path);
- dropped returns as all-zero rows (real driver behavior for
  no-return pixels);
- intra-sweep motion: each azimuth column is raycast from its own
  slerp/lerp-interpolated pose, so motion compensation actually
  matters;
- bz2-compressed multi-MB chunks (`--compression bz2`), the format
  arm the reference ingests through the rosbag C++ stack;
- ground truth as /tf messages interleaved in-stream (and a TUM
  sidecar file for direct eval).

Scene + trajectory come from loner_tpu.datasets.synthetic (the same
generator the test suite and artifact drives use), so a SLAM run on the
converted output has exact ground truth.

Example (the ~2 GB drill bag):
    python examples/scripts/make_synthetic_bag.py outputs/drill/drill.bag \
        --duration 60 --channels 128 --columns 1024 --compression bz2
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

from loner_tpu.common.trajectory import TrajectoryInterpolator, dump_trajectory_to_tum
from loner_tpu.datasets.rosbag_writer import (
    OUSTER_FIELDS,
    OUSTER_POINT_STEP,
    BagWriter,
    ouster_blob,
    pointcloud2_bytes,
    tf_message_bytes,
)
from loner_tpu.datasets.synthetic import (
    BoxRoomScene,
    make_trajectory,
    surface_intensity,
)
from scipy.spatial.transform import Rotation as _R


def build_scan_arrays(scene, interp, t_start, channels, columns,
                      v_fov=(-22.5, 22.5), scan_period=0.1,
                      max_range=60.0, noise_std=0.01, seed=0):
    """Raycast one organized sweep with per-column poses.

    Returns (xyz (C*W, 3) ring-major, t_ns (C*W,), intensity, ring,
    range_mm) with dropped returns zeroed.
    """
    rng = np.random.default_rng(seed)
    elev = np.deg2rad(np.linspace(v_fov[0], v_fov[1], channels))
    azim = np.linspace(0, 2 * np.pi, columns, endpoint=False)
    az, el = np.meshgrid(azim, elev, indexing="xy")  # (channels, columns)
    dirs_sensor = np.stack(
        [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)], axis=-1
    )  # (channels, columns, 3), ring-major layout

    col_times = t_start + np.arange(columns) / columns * scan_period
    # Per-column world pose (intra-sweep motion): slerp/lerp at col time.
    rots = np.empty((columns, 3, 3))
    trans = np.empty((columns, 3))
    for c, t in enumerate(col_times):
        m = interp.at(t).matrix
        rots[c], trans[c] = m[:3, :3], m[:3, 3]

    dirs_world = np.einsum("cij,kcj->kci", rots, dirs_sensor)  # (ch, cols, 3)
    origins = np.broadcast_to(trans[None], dirs_world.shape)
    flat_d = dirs_world.reshape(-1, 3)
    flat_o = origins.reshape(-1, 3)
    depth = scene.raycast(flat_o, flat_d)
    depth = depth + rng.normal(0, noise_std, depth.shape)
    hits = flat_o + flat_d * depth[:, None]

    dropped = (depth <= 0.05) | (depth > max_range) | (
        rng.random(depth.shape) < 0.002  # sporadic no-returns
    )
    xyz_sensor = dirs_sensor.reshape(-1, 3) * depth[:, None]
    xyz_sensor[dropped] = 0.0

    inten = (surface_intensity(hits).mean(axis=1) * 255.0).astype(np.float32)
    inten[dropped] = 0.0
    t_ns_col = ((col_times - t_start) * 1e9).astype(np.uint64)
    t_ns = np.broadcast_to(t_ns_col[None, :], (channels, columns)).reshape(-1)
    ring = np.broadcast_to(
        np.arange(channels, dtype=np.uint8)[:, None], (channels, columns)
    ).reshape(-1)
    range_mm = (depth * 1000.0).clip(0, 2**32 - 1).astype(np.uint64)
    range_mm[dropped] = 0
    return xyz_sensor.astype(np.float32), t_ns, inten, ring, range_mm, col_times


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out_bag")
    p.add_argument("--duration", type=float, default=60.0, help="seconds")
    p.add_argument("--rate", type=float, default=10.0, help="scan rate Hz")
    p.add_argument("--channels", type=int, default=128)
    p.add_argument("--columns", type=int, default=1024)
    p.add_argument("--compression", choices=["none", "bz2"], default="bz2")
    p.add_argument("--chunk_mb", type=float, default=4.0)
    p.add_argument(
        "--timestamp_mode", choices=["ouster_ns", "epoch_f64", "zeros"],
        default="ouster_ns",
        help="ouster_ns: u32 ns scan-local (real driver); epoch_f64: "
        "absolute f64 epoch seconds in a FLOAT64 't' field; zeros: "
        "degenerate stamps forcing --recompute_timestamps",
    )
    p.add_argument("--epoch", type=float, default=1.7e9,
                   help="bag epoch (header stamps are epoch + t)")
    p.add_argument("--noise_std", type=float, default=0.01)
    p.add_argument(
        "--traj_height", type=float, default=1.6,
        help="trajectory z (default clears the box obstacles; the "
        "0.5 m artifact-drive height intersects obstacle 1's face and "
        "zeroes ~28%% of returns)",
    )
    p.add_argument("--tf_rate", type=float, default=100.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--lidar_topic", default="/os_cloud_node/points")
    args = p.parse_args()

    n_scans = int(round(args.duration * args.rate))
    scene = BoxRoomScene()
    # Trajectory sampled densely (4x scan rate) for smooth intra-sweep
    # interpolation; loops around the room like the artifact drives.
    traj_hz = args.rate * 4
    n_poses = int(round(args.duration * traj_hz)) + 8
    poses, pose_ts = make_trajectory(
        scene, n_poses, rate_hz=traj_hz, height=args.traj_height,
        angular_span=2.0 * np.pi * args.duration / 60.0, t_start=0.0,
    )
    interp = TrajectoryInterpolator(poses, pose_ts)

    os.makedirs(os.path.dirname(os.path.abspath(args.out_bag)), exist_ok=True)
    gt_path = os.path.splitext(args.out_bag)[0] + "_gt.tum"
    dump_trajectory_to_tum(poses, pose_ts + args.epoch, gt_path)

    t_wall = time.time()
    total_points = 0
    with BagWriter(args.out_bag, compression=args.compression,
                   chunk_bytes=int(args.chunk_mb * 1024 * 1024)) as bag:
        bag.add_connection(args.lidar_topic, "sensor_msgs/PointCloud2")
        bag.add_connection("/tf", "tf2_msgs/TFMessage")

        # /tf ground truth at tf_rate, interleaved chronologically.
        tf_ts = np.arange(0.0, args.duration, 1.0 / args.tf_rate)
        tf_i = 0

        for i in range(n_scans):
            t0 = i / args.rate
            while tf_i < len(tf_ts) and tf_ts[tf_i] <= t0:
                t = tf_ts[tf_i]
                m = interp.at(t).matrix
                q = _R.from_matrix(m[:3, :3]).as_quat()  # xyzw
                bag.write(
                    "/tf",
                    tf_message_bytes(t + args.epoch, "map", "body", m[:3, 3], q,
                                     seq=tf_i),
                    t + args.epoch,
                )
                tf_i += 1

            xyz, t_ns, inten, ring, range_mm, _ = build_scan_arrays(
                scene, interp, t0, args.channels, args.columns,
                scan_period=1.0 / args.rate if args.rate < 10 else 0.1,
                noise_std=args.noise_std, seed=args.seed + i,
            )
            stamp = t0 + args.epoch
            if args.timestamp_mode == "zeros":
                t_ns = np.zeros_like(t_ns)
            if args.timestamp_mode == "epoch_f64":
                # FLOAT64 epoch-absolute per-point times in a wider field
                # (some drivers emit these; exercises the s-vs-ns branch).
                fields = [f for f in OUSTER_FIELDS if f[0] != "t"] + [
                    ("t", 32, 8)  # FLOAT64 at a free offset
                ]
                blob = np.frombuffer(
                    ouster_blob(xyz, np.zeros(len(xyz)), inten, ring, range_mm),
                    np.uint8,
                ).reshape(-1, OUSTER_POINT_STEP).copy()
                abs_t = (t_ns.astype(np.float64) * 1e-9) + stamp
                blob[:, 32:40] = abs_t.view(np.uint8).reshape(-1, 8)
                payload = blob.tobytes()
            else:
                fields = OUSTER_FIELDS
                payload = ouster_blob(xyz, t_ns, inten, ring, range_mm)
            msg = pointcloud2_bytes(
                stamp, "os_sensor", args.channels, args.columns, fields,
                OUSTER_POINT_STEP, payload, seq=i,
            )
            bag.write(args.lidar_topic, msg, stamp)
            total_points += len(xyz)
            if (i + 1) % 50 == 0:
                mb = os.path.getsize(args.out_bag) / 1e6
                print(f"  scan {i + 1}/{n_scans}, {mb:.0f} MB on disk, "
                      f"{time.time() - t_wall:.0f}s", flush=True)

    dt = time.time() - t_wall
    size = os.path.getsize(args.out_bag)
    print(
        f"wrote {args.out_bag}: {size / 1e9:.2f} GB, {n_scans} scans, "
        f"{total_points / 1e6:.1f} M points, {dt:.0f} s "
        f"({size / 1e6 / dt:.0f} MB/s), gt: {gt_path}"
    )


if __name__ == "__main__":
    main()
