#!/usr/bin/env bash
# Batch driver over every per-sequence config, lite model, 3 trials each.
# Counterpart of /root/reference/examples/scripts/run_all_lite.sh:1-9 —
# there each sequence names a rosbag inside its yaml; here the dataset
# root holding the converted scan-streams (see examples/convert_rosbag.py)
# is passed as $1 and each sequence's stream is expected at
# <root>/<sequence-stem>/ (e.g. <root>/canteen/). Trials fan out over
# local devices via the device pool (the reference pins --gpu_ids).
set -euo pipefail

root="${1:?usage: run_all_lite.sh <converted-dataset-root>}"
cd "$(dirname "$0")/../.."

sequences=(cfg/fusion_portable/canteen.yaml cfg/fusion_portable/garden.yaml
           cfg/fusion_portable/mcr.yaml cfg/newer_college/quad.yaml)

for s in "${sequences[@]}"; do
  stem="$(basename "$s" .yaml)"
  python3 examples/run_loner.py "$root/$stem" "$s" --num_repeats 3 --lite
done
