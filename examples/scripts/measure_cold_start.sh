#!/usr/bin/env bash
# Cold-start budget (VERDICT r3 item 6): measure the XLA compile cost a
# fresh machine pays before SLAM can start, and what the persistent
# cache + install-time seeding (`run_loner.py --seed_cache`) cut it to.
#
#   bash examples/scripts/measure_cold_start.sh [config] [dataset]
#
# Three timed runs of the seed-cache path (compile ALL tracking/mapping
# programs, then exit):
#   1. COLD   — empty compilation cache (fresh machine)
#   2. WARM   — same cache, new process (deserialization only)
#   3. SEEDED — the default user cache after install-time seeding
set -euo pipefail
cd "$(dirname "$0")/../.."

CFG=${1:-cfg/synthetic/box_room_tpu_rt_r3.yaml}
DS=${2:-auto}
OUT=outputs/cold_start
mkdir -p "$OUT"
FRESH=$(mktemp -d /tmp/loner_cold_cache.XXXX)

run_seed() { # $1=cache dir, $2=tag
    local t0 t1
    t0=$(date +%s.%N)
    LONER_COMPILE_CACHE="$1" python examples/run_loner.py "$DS" "$CFG" \
        --seed_cache --experiment_name "cold_start_$2" \
        > "$OUT/$2.log" 2>&1
    t1=$(date +%s.%N)
    python - "$2" "$t0" "$t1" "$OUT/$2.log" <<'EOF'
import json, re, sys
tag, t0, t1, log = sys.argv[1:5]
warm = None
for line in open(log):
    m = re.search(r"tracker compiled in ([0-9.]+)s, \n?", line)
    m2 = re.search(r"mapper in ([0-9.]+)s", line)
    if m and m2:
        warm = float(m.group(1)) + float(m2.group(1))
print(json.dumps({"tag": tag, "wall_s": round(float(t1)-float(t0), 1),
                  "warmup_s": warm}))
EOF
}

echo "== 1/3 COLD (empty cache) =="
run_seed "$FRESH" cold | tee "$OUT/cold.json"
echo "== 2/3 WARM (same cache, new process) =="
run_seed "$FRESH" warm | tee "$OUT/warm.json"
echo "== 3/3 SEEDED (default user cache) =="
run_seed "${HOME}/.cache/jax_compilation" seeded | tee "$OUT/seeded.json"
rm -rf "$FRESH"
echo "results in $OUT/"
