#!/bin/bash
# Two-parallelism scaling evidence (BASELINE.md §3): one JVM per leg
# (running both legs in one JVM distorts the second leg by ~3x via
# tenured-heap garbage), identical deterministic input, efficiency =
# (throughput_4N / throughput_N) / 4, pass >= 0.8.
#
# Usage: tools/run_scaling.sh [pages] [hosts] [timedRounds] [batch] [prefetched] [walksPerNode] [coresA] [coresB]
set -e
cd "$(dirname "$0")/.."
PAGES=${1:-1000000}; HOSTS=${2:-2000}; ROUNDS=${3:-3}; BATCH=${4:-25000}
PREF=${5:-100000}; WPN=${6:-10}; A=${7:-8}; B=${8:-32}

run_leg() {
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g} sbt -batch \
    "runMain graft.app.ScalingBench $1 $PAGES $HOSTS $ROUNDS $BATCH $PREF $WPN" 2>&1 |
    grep -o '{"leg":.*}' | tail -1
}

LEG_A=$(run_leg "$A")
LEG_B=$(run_leg "$B")

python3 - "$A" "$B" <<EOF
import json, sys
a = json.loads('''$LEG_A''')["leg"]
b = json.loads('''$LEG_B''')["leg"]
assert a["fingerprint"] == b["fingerprint"], "determinism violated between legs"
ratio = int(sys.argv[2]) / int(sys.argv[1])
eff = (b["urlsPerSec"] / a["urlsPerSec"]) / ratio
out = {"metric": "urls_scheduled_per_sec", "runs": [a, b],
       "coreRatio": ratio, "speedup": b["urlsPerSec"]/a["urlsPerSec"],
       "efficiency": eff, "passLine": 0.8, "pass": eff >= 0.8}
for r in out["runs"]:
    r.pop("fingerprint", None)
print(json.dumps(out))
EOF
