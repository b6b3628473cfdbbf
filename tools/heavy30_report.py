#!/usr/bin/env python3
"""Merge a `heavy_30x` block into an existing SCALE_r{N}.json (r20
directive #7): the 100 TB claim rests on extrapolation, so the heavy
dedup/ANN production paths run at 30x too and the 30x/10x growth ratio is
recorded per query — a log-linear operator shows ~3x (3.3 for n log n), a
hidden quadratic shows ~9x.

Usage:
  python3 tools/heavy30_report.py SCALE_rN.json heavy30_runs.jsonl

heavy30_runs.jsonl holds >=2 warm Bench lines from the 30x corpus run with
SPARK_GRAFT_ONLY set to the heavy family; per-query 30x time is the min
across lines (cold pass excluded by the capture script, like the 10x
methodology).
"""
import json
import sys

HEAVY = ["q42", "q72", "q79", "q92", "q93", "q126"]

scale_path, runs_path = sys.argv[1:3]
scale = json.load(open(scale_path))
runs = [json.loads(l) for l in open(runs_path) if l.strip()]
if not runs:
    raise SystemExit(f"no bench lines in {runs_path}")

def short(k):
    # bench captures key by full registry name; HEAVY uses the qNN prefix
    return k.split("_")[0]

keys = set(map(short, runs[0]["queries"]))
for r in runs[1:]:
    keys &= set(map(short, r["queries"]))
t30 = {short(k): round(min(r["queries"][k2] for r in runs
                           for k2 in r["queries"] if short(k2) == short(k)), 3)
       for k in runs[0]["queries"] if short(k) in keys}
t10 = {short(k): v for k, v in scale["per_query_sec_10x"].items()}

rows = {}
failed = []
for q in HEAVY:
    if q not in t30:
        failed.append(q)
        continue
    base = t10.get(q)
    rows[q] = {
        "sec_10x": base,
        "sec_30x": t30[q],
        "growth_30x_vs_10x": round(t30[q] / base, 2) if base else None,
    }

scale["heavy_30x"] = {
    "multiplier_vs_sf01": 30,
    "baseline": "the same capture's uniform 10x corpus",
    "note": "3x data from the 10x point: a log-linear operator shows ~3x "
            "(3.3 for n log n), a hidden quadratic ~9x",
    "queries": rows,
    "queries_failed_at_30x": failed,
}
json.dump(scale, open(scale_path, "w"), indent=1)
print(f"merged heavy_30x into {scale_path}: " +
      ", ".join(f"{q}={v['growth_30x_vs_10x']}x" for q, v in rows.items()) +
      (f"; FAILED: {failed}" if failed else "; zero failures"))
