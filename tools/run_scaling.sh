#!/usr/bin/env bash
# Two-parallelism scaling run (north rule evidence): same job + input at
# local[N] and local[4N], each in a FRESH JVM, -> BENCH/BASELINE.md.
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-2}"
REPOS="${2:-4200}"
FILES="${3:-240}"
export SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-32g}"

run() {
  sbt -batch "runMain graft.ScalingBench $1 $REPOS $FILES" 2>/dev/null \
    | grep -o '{"metric":"kg_throughput".*}' | tail -1
}

echo "running local[$N]..." >&2
J1="$(run "$N")"
echo "$J1" >&2
echo "running local[$((4 * N))]..." >&2
J2="$(run "$((4 * N))")"
echo "$J2" >&2

python3 - "$J1" "$J2" <<'EOF'
import json, sys
a, b = json.loads(sys.argv[1]), json.loads(sys.argv[2])
eff = (b["files_per_sec"] / a["files_per_sec"]) / (b["cores"] / a["cores"])
md = f"""# BENCH — measured scaling (graft.ScalingBench via tools/run_scaling.sh)

Same job (full KG pipeline, exact link mode), same input (deterministic
corpus, {a['docs']} docs), run at `local[{a['cores']}]` and
`local[{b['cores']}]` in separate JVMs — cores stand in for executors
per BASELINE.md's measurement plan.

| parallelism | wall sec | files/sec |
| --- | --- | --- |
| local[{a['cores']}] | {a['sec']:.2f} | {a['files_per_sec']:.1f} |
| local[{b['cores']}] | {b['sec']:.2f} | {b['files_per_sec']:.1f} |

**Scaling efficiency** = (thr_4N / thr_N) / 4 = **{eff:.3f}** (target >= 0.8).

Raw N:  `{json.dumps(a)}`
Raw 4N: `{json.dumps(b)}`
"""
import os
os.makedirs("BENCH", exist_ok=True)
open("BENCH/BASELINE.md", "w").write(md)
print(f"scaling efficiency: {eff:.3f}")
EOF
