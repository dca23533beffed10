#!/usr/bin/env bash
# Two-cluster-size scaling evidence: interleaved A/B runs, one JVM each,
# best-of per size → efficiency = (eps4N / epsN) / 4. Writes BENCH_SCALING.json.
set -euo pipefail
cd "$(dirname "$0")/.."
N=${GRAFT_SCALE_N:-8}
N4=$((N * 4))
REPS=${GRAFT_SCALE_REPS:-2}
export GRAFT_SCALE_EVENTS=${GRAFT_SCALE_EVENTS:-4000000}
export GRAFT_SCALE_BATCHES=${GRAFT_SCALE_BATCHES:-4}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-32g}

run() { # cores -> events_per_sec
  # pin the WHOLE JVM (incl. GC/shuffle threads) to exactly $1 CPUs —
  # without this the "N-core" run borrows idle machine cores for GC and
  # inflates the baseline, understating true N->4N efficiency. Bare JVM via
  # runjvm.sh: sbt's own JVM would otherwise share the pinned cores and add
  # ~60s startup per measurement (compile first: sbt -batch compile).
  taskset -c "0-$(($1 - 1))" scripts/runjvm.sh graft.ScalingBench "$1" 2>/dev/null \
    | grep -o '"events_per_sec":[0-9]*' | cut -d: -f2
}

declare -a small big
for i in $(seq 1 "$REPS"); do
  echo "[scaling] rep $i: local[$N]..." >&2
  small+=("$(run "$N")")
  rm -rf /dev/shm/graft-bench/* 2>/dev/null || true
  echo "[scaling] rep $i: local[$N4]..." >&2
  big+=("$(run "$N4")")
  rm -rf /dev/shm/graft-bench/* 2>/dev/null || true
done

best() { printf '%s\n' "$@" | sort -rn | head -1; }
BS=$(best "${small[@]}"); BB=$(best "${big[@]}")
EFF=$(python3 -c "print(round(($BB / $BS) / ($N4 / $N), 3))")
JSON=$(python3 - "$BS" "$BB" "$EFF" <<EOF
import sys, json
print(json.dumps({"metric": "scaling_efficiency", "value": float(sys.argv[3]),
  "unit": "ratio", "n_cores": $N, "n4_cores": $N4,
  "events": int("$GRAFT_SCALE_EVENTS"), "batches": int("$GRAFT_SCALE_BATCHES"),
  "events_per_sec_n": int(sys.argv[1]), "events_per_sec_4n": int(sys.argv[2]),
  "runs": {"n": [${small[0]}, ${small[@]: -1}], "n4": [${big[0]}, ${big[@]: -1}]}}))
EOF
)
echo "$JSON" | tee BENCH_SCALING.json
