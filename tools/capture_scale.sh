#!/bin/bash
# Capture SCALE_r{N}.json: full-registry bench at sf0.1, at a 10x uniform
# corpus, at a 10x hot-key-skewed corpus, plus the skew-weapons micro-bench.
# Usage: bash tools/capture_scale.sh SCALE_r08.json
# Methodology (matches tools/scale_report.py): per-query min over 2 warm
# full-registry runs; the cold pass right after writing a corpus is discarded
# (page-cache effects inflate I/O-bound queries up to 14x).
set -e
cd "$(dirname "$0")/.."
OUT=${1:?usage: capture_scale.sh SCALE_rN.json}
R=/tmp/scale_capture
mkdir -p $R
rm -f $R/*.jsonl $R/skewbench.json

echo "=== scaleup uniform ==="
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_scale10 10 uniform" 2>&1 | grep '\[scaleup\]'
echo "=== scaleup skewed ==="
sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_scale10_skew 10 skewed" 2>&1 | grep '\[scaleup\]'

bench() { # $1=sfdir $2=out(jsonl or /dev/null)
  SPARK_GRAFT_SF_DIR=$1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT=$R/bench_line.json \
    sbt -batch "runMain graft.Bench" > $R/bench_stdout.log 2>&1
  cat $R/bench_line.json >> "$2"
  echo "done bench $1 -> $2 ($(date +%H:%M:%S))"
}

echo "=== sf0.1 warm x2 ==="
bench /root/testdata/sf0.1 $R/sf01.jsonl
bench /root/testdata/sf0.1 $R/sf01.jsonl

echo "=== uniform 10x: cold discard + warm x2 ==="
bench /tmp/graft_scale10 /dev/null
bench /tmp/graft_scale10 $R/scale10.jsonl
bench /tmp/graft_scale10 $R/scale10.jsonl

echo "=== skewed 10x: cold discard + warm x2 ==="
bench /tmp/graft_scale10_skew /dev/null
bench /tmp/graft_scale10_skew $R/skew10.jsonl
bench /tmp/graft_scale10_skew $R/skew10.jsonl

echo "=== skewbench ==="
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.SkewBench /tmp/graft_scale10_skew 2" 2>&1 \
  | grep '"hot_custkey_share"' > $R/skewbench.json

python3 tools/scale_report.py $R/sf01.jsonl $R/scale10.jsonl "$OUT" \
  $R/skew10.jsonl $R/skewbench.json
echo "CAPTURE COMPLETE: $OUT"
