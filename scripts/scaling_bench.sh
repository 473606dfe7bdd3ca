#!/bin/bash
# Two-cluster-size scaling evidence: identical CDC ingest at local[N] and
# local[4N], each in its own JVM, best-of-reps. Writes BENCH_SCALING.md.
set -e
cd "$(dirname "$0")/.."
EVENTS=${1:-2000000}
NSMALL=${2:-8}
REPS=${3:-3}
NBIG=$((NSMALL * 4))
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}

run_level() {
  local cores=$1
  sbt -batch "runMain graft.app.ScalingBench $EVENTS $cores $REPS" 2>/tmp/scaling_$cores.err \
    | grep '"metric":"ingest_eps"' | sed 's/^\[info\] //' | tail -1
}

echo "== level local[$NSMALL]"
J1=$(run_level $NSMALL); echo "$J1"
echo "== level local[$NBIG]"
J2=$(run_level $NBIG); echo "$J2"

python3 - "$J1" "$J2" "$EVENTS" "$NSMALL" "$NBIG" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = b["best_eps"] / (4 * a["best_eps"])
out = {
  "metric": "scaling_efficiency", "value": round(eff, 3), "unit": "ratio",
  "n_small": a["cores"], "n_big": b["cores"], "events": a["events"],
  "eps_small": a["best_eps"], "eps_big": b["best_eps"],
  "sec_small": a["best_sec"], "sec_big": b["best_sec"],
  "max_batch": a["max_batch"], "n_buckets": a["n_buckets"],
}
print(json.dumps(out))
open("BENCH_SCALING.json", "w").write(json.dumps(out) + "\n")
md = f"""# BENCH_SCALING — two-cluster-size CDC ingest evidence

Identical job (streaming binlog tail -> dedup -> MERGE into LakeTable),
identical deterministic input ({a['events']} skewed change events),
each parallelism level in its own JVM, best of {sys.argv[0] and 3} reps.

| level | events/sec | seconds |
| --- | --- | --- |
| local[{a['cores']}] (N) | {a['best_eps']:.0f} | {a['best_sec']:.2f} |
| local[{b['cores']}] (4N) | {b['best_eps']:.0f} | {b['best_sec']:.2f} |

Scaling efficiency E = eps_4N / (4 * eps_N) = **{eff:.3f}** (target >= 0.8).
Config: maxEventsPerBatch={a['max_batch']}, nBuckets={a['n_buckets']},
shuffle.partitions = cores at each level.
"""
open("BENCH_SCALING.md", "w").write(md)
EOF
