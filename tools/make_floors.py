#!/usr/bin/env python3
"""Rebuild PERF_FLOORS.tsv from N bench captures (per-query MIN)."""
import json, sys

def short(k):
    # the driver's BENCH json (stdout) uses the compact qNN ids; the floors
    # file must key the same way or the floor gate can never match a row
    return k.split("_")[0]

captures = [{short(k): v for k, v in json.load(open(p))["queries"].items()}
            for p in sys.argv[1:]]
keys = sorted(set(k for c in captures for k in c))
floors = {k: min(c[k] for c in captures if k in c) for k in keys}

header = """# Per-query wall-clock floor (sec) at sf0.1, local[32] - the REGEN DETECTOR
# companion to PLAN_BUDGETS.tsv: PLAN_BUDGETS catches plan drift; this file
# records the measured floor on the CURRENT testdata files (pyarrow-16 regen
# of 2026-08-13, single row group per file, NTZ-annotated timestamps read as
# session-zone TimestampType via Tables.load). A future testdata rewrite that
# changes scan cost shows up as a broad drift against these numbers with
# PLAN_BUDGETS unchanged - exactly the round-8 signature.
# Round-15 re-ratchet: floors are the per-query MIN across THREE idle-machine
# captures taken after the r15 Hadoop-FS-metadata / O(delta)-CDC /
# sorted-compaction work landed, over the grown 131-row bench set (the 126
# r14 rows + q124_cdc_odelta + q125_sorted_compaction).
# Regenerate: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt 'runMain graft.Bench'
# Floors are the per-query MIN across this round's idle-machine captures.
# query\tfloor_sec
"""
with open("PERF_FLOORS.tsv", "w") as f:
    f.write(header)
    for k in keys:
        f.write(f"{k}\t{floors[k]}\n")
print(f"wrote PERF_FLOORS.tsv ({len(keys)} rows)")
