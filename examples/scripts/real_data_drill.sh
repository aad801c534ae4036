#!/usr/bin/env bash
# Real-data readiness drill (docs/REAL_DATA.md): manufacture a multi-GB
# adversarial Ouster bag, convert it, run SLAM on the real chip, compute
# metrics — one command, throughput measured at each stage.
#
#   bash examples/scripts/real_data_drill.sh [out_dir] [duration_s]
set -euo pipefail
cd "$(dirname "$0")/../.."

OUT=${1:-outputs/drill}
DUR=${2:-60}
BAG="$OUT/drill.bag"

mkdir -p "$OUT"

echo "== 1/4 generate bag ($DUR s, 128ch x 1024 cols, bz2) =="
t0=$(date +%s)
python examples/scripts/make_synthetic_bag.py "$BAG" \
    --duration "$DUR" --channels 128 --columns 1024 --compression bz2 \
    | tee "$OUT/generate.log"
t1=$(date +%s)

echo "== 2/4 convert bag -> scan stream =="
python examples/convert_rosbag.py "$BAG" "$OUT/dataset" \
    --gt_topic /tf --gt_frame body | tee "$OUT/convert.log"
t2=$(date +%s)
BAG_MB=$(du -m "$BAG" | cut -f1)
echo "converter throughput: $BAG_MB MB in $((t2-t1)) s = $((BAG_MB/(t2-t1>0?t2-t1:1))) MB/s" \
    | tee -a "$OUT/convert.log"

echo "== 3/4 SLAM on the converted stream (real chip) =="
python examples/run_loner.py "$OUT/dataset" cfg/synthetic/box_room_drill.yaml \
    --precompile --experiment_name drill_run | tee "$OUT/slam.log"
t3=$(date +%s)

echo "== 4/4 metrics =="
LOGDIR=$(ls -dt outputs/drill_run* | head -1)
cp "$OUT/dataset/poses_gt.tum" "$LOGDIR/trajectory/groundtruth.txt" 2>/dev/null || true
python -m loner_tpu.analysis.metrics_pipeline "$LOGDIR" | tee "$OUT/metrics.log"

echo "== drill timings =="
echo "generate: $((t1-t0)) s; convert: $((t2-t1)) s; slam: $((t3-t2)) s" \
    | tee "$OUT/timings.log"
