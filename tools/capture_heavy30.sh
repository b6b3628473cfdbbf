#!/bin/bash
# Heavy-family 30x probe (r20 directive #7): run the dedup/ANN production
# paths on a 30x corpus and merge the 30x/10x growth into an existing
# SCALE_r{N}.json (which already carries the 10x times).
# Usage: bash tools/capture_heavy30.sh SCALE_r20.json
# Run AFTER capture_scale.sh. Methodology matches it: cold pass right after
# writing the corpus is discarded, then min over 2 warm runs.
set -e
cd "$(dirname "$0")/.."
OUT=${1:?usage: capture_heavy30.sh SCALE_rN.json}
[ -f "$OUT" ] || { echo "$OUT not found — run capture_scale.sh first"; exit 1; }
R=/tmp/scale_capture
mkdir -p $R
rm -f $R/heavy30.jsonl

HEAVY=q42,q72,q79,q92,q93,q126

echo "=== scaleup uniform 30x ==="
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_scale30 30 uniform" 2>&1 | grep '\[scaleup\]'

bench() { # $1=out(jsonl or /dev/null)
  SPARK_GRAFT_SF_DIR=/tmp/graft_scale30 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_ONLY=$HEAVY SPARK_GRAFT_BENCH_OUT=$R/bench_line.json \
    sbt -batch "runMain graft.Bench" > $R/bench_stdout30.log 2>&1
  cat $R/bench_line.json >> "$1"
  echo "done heavy bench -> $1 ($(date +%H:%M:%S))"
}

echo "=== heavy 30x: cold discard + warm x2 ==="
bench /dev/null
bench $R/heavy30.jsonl
bench $R/heavy30.jsonl

python3 tools/heavy30_report.py "$OUT" $R/heavy30.jsonl
echo "HEAVY30 COMPLETE: $OUT"
