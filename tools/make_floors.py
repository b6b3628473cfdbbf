#!/usr/bin/env python3
"""Rebuild PERF_FLOORS.tsv from N bench captures (per-query MIN).

Usage: python3 tools/make_floors.py run1.json run2.json [...]
Run from the repo root; captures are SPARK_GRAFT_BENCH_OUT files from idle
sf0.1 `runMain graft.Bench` runs.
"""
import json, os, sys

if len(sys.argv) < 2:
    sys.exit("usage: make_floors.py <bench_capture.json> [...] — refusing "
             "to truncate PERF_FLOORS.tsv with zero captures")
if not os.path.exists("PLAN_BUDGETS.tsv"):
    sys.exit("run from the repo root (PLAN_BUDGETS.tsv not found in CWD)")


def short(k):
    # the driver's BENCH json (stdout) uses the compact qNN ids; the floors
    # file must key the same way or the floor gate can never match a row
    return k.split("_")[0]

captures = [{short(k): v for k, v in json.load(open(p))["queries"].items()}
            for p in sys.argv[1:]]
keys = sorted(set(k for c in captures for k in c))

floors = {k: min(c[k] for c in captures if k in c) for k in keys}

header = f"""# Per-query wall-clock floor (sec) at sf0.1, local[32] - the REGEN DETECTOR
# companion to PLAN_BUDGETS.tsv: PLAN_BUDGETS catches plan drift; this file
# records the measured floor on the CURRENT testdata files (pyarrow-16 regen
# of 2026-08-13, single row group per file, NTZ-annotated timestamps read as
# session-zone TimestampType via Tables.load). A future testdata rewrite that
# changes scan cost shows up as a broad drift against these numbers with
# PLAN_BUDGETS unchanged - exactly the round-8 signature.
# Floors are the per-query MIN across {len(captures)} idle-machine captures
# over the current {len(keys)}-row bench set.
#
# GATE SEMANTICS (r17 redefinition, tools/floor_gate.py): a bench row flags
# only when its LOAD-NORMALIZED ratio exceeds 2x -
#   load_factor = median over common rows of bench/floor;
#   flag q iff (bench(q)/floor(q)) / load_factor > 2.0.
# Rationale: the shared sandbox's ambient load swings whole captures
# 1.3-2x uniformly with zero plan drift (BENCH_r16: 11/134 rows past a RAW
# 2x, zero past the normalized gate); a real regression moves a query
# AGAINST its peers, which the median cancels out of. q30's r12-r16
# 0.86-1.38 s swing was pinned as this noise class (stateless self-join,
# zero fixture state, isolated re-runs span the same band).
#
# Regenerate: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \\
#   SPARK_GRAFT_BENCH_OUT=/tmp/runN.json sbt 'runMain graft.Bench'  (xN idle)
#   then python3 tools/make_floors.py /tmp/run*.json
# Check a capture: python3 tools/floor_gate.py BENCH_rN.json
# query\tfloor_sec
"""
with open("PERF_FLOORS.tsv", "w") as f:
    f.write(header)
    for k in keys:
        f.write(f"{k}\t{floors[k]}\n")
print(f"wrote PERF_FLOORS.tsv ({len(keys)} rows)")
