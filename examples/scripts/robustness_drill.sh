#!/bin/bash
# Dynamic-world robustness drill (VERDICT r4 item 6) at reference scene
# scale: the courtyard flagship config driven through degraded variants
# of the same 151 s trajectory —
#   actors : moving pedestrians transiting the lidar FOV
#            (reference real datasets contain these; the reference has
#            no explicit dynamic handling — multi-view consistency of
#            the depth loss must average transients away)
#   nX     : i.i.d. Gaussian range noise, sigma X meters
#   dX     : per-return dropout with probability X
# Datasets share the static variant's ground-truth trajectory, so the
# static GT map (outputs/gt_map_courtyard.pcd) is the evaluation target
# for every run: the STATIC geometry is what must be reconstructed.
#
# Serializes with any other TPU job — one axon process at a time.
# Usage: bash examples/scripts/robustness_drill.sh
set -e
cd "$(dirname "$0")/../.."
# Base config: the TUNED r5f pick (10k ICP points, 3-stage schedule,
# frozen mapper poses — artifacts/scale_drive_r5/tracking_ab.yaml).
# Static baseline ATE 0.31 m / RTF 0.998, so degradation deltas read
# directly instead of being swamped by the reference-parity config's
# 0.99 m drift.
CFG=cfg/synthetic/courtyard_tpu_r5f.yaml

run() { # run <experiment_name> <extra run_loner args...>
  name=$1; shift
  if [ -f "outputs/${name}/runtime.txt" ]; then
    echo "== ${name}: already done, skipping"
    return
  fi
  echo "== ${name}: $(date -u +%H:%M:%S)"
  python examples/run_loner.py synthetic "$CFG" --precompile \
    --experiment_name "$name" "$@"
  echo "== ${name} done: $(date -u +%H:%M:%S)"
}

run courtyard_actors_r5 --synthetic_scene courtyard_actors
run courtyard_n0.05_r5  --synthetic_scene courtyard --synthetic_noise_std 0.05
run courtyard_n0.15_r5  --synthetic_scene courtyard --synthetic_noise_std 0.15
run courtyard_d0.3_r5   --synthetic_scene courtyard --synthetic_dropout 0.3
run courtyard_d0.6_r5   --synthetic_scene courtyard --synthetic_dropout 0.6
echo "robustness drill drives complete"
