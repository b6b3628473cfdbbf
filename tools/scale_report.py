#!/usr/bin/env python3
"""Assemble SCALE_r{N}.json from warm Bench runs at sf0.1 and at the 10x
corpus (graft.tools.ScaleUp output).

Usage:
  python3 tools/scale_report.py sf01_runs.jsonl scale10_runs.jsonl out.json \
      [skew10_runs.jsonl [skewbench.json]]

Each input file holds one Bench JSON line per warm run (>=2 recommended);
per-query times are the min across runs (each Bench line is itself a
min-of-2-reps), excluding the cold-page-cache pass right after writing the
corpus, which inflates I/O-bound queries up to 14x.

Optional skewed inputs (`ScaleUp … skewed` corpus): skew10_runs.jsonl adds a
"skewed" section (full registry on the hot-key corpus, growth vs the uniform
10x), and skewbench.json (graft.tools.SkewBench's JSON line) lands verbatim
as "skew_weapons".
"""
import json
import sys


def best(path):
    runs = [json.loads(l) for l in open(path) if l.strip()]
    if not runs:
        raise SystemExit(f"no bench lines in {path}")
    # Intersect query keys across runs: a line missing a query (partial run,
    # interrupted bench) drops that query with a notice instead of a KeyError.
    keys = set(runs[0]["queries"])
    for r in runs[1:]:
        keys &= set(r["queries"])
    dropped = set(runs[0]["queries"]) - keys
    if dropped:
        print(f"note: {path} dropped from min (absent in some run): "
              f"{sorted(dropped)}", file=sys.stderr)
    qs = {k: round(min(r["queries"][k] for r in runs), 3) for k in sorted(keys)}
    return qs, runs[0].get("sf")


def main():
    sf01_path, s10_path, out_path = sys.argv[1:4]
    base, _ = best(sf01_path)
    ten, _ = best(s10_path)
    common = [q for q in base if q in ten]
    growth = {q: round(ten[q] / base[q], 2) if base[q] > 0 else None
              for q in common}
    # None growths (zero base time) are excluded from the worst-query pick
    # explicitly — they carry no growth information, not a best-case 0.
    # ORACLE-BASELINE rows are excluded too (r19): their scale growth is by
    # design not a production-path signal — they generate exact ground
    # truth for operators whose linear production form is a separate row.
    # Their growths still land in the report under oracle_baseline_rows.
    ORACLE_BASELINE = {
        "q48_embedding_neardup":
            "exact all-pairs cosine ground truth (quadratic by definition);"
            " the production path is q79's LSH-bucketed linear form",
        "q98_semantic_decontam":
            "ScaleUp replicates the eval split together with the corpus, so"
            " train x eval fixture work grows superlinearly by design;"
            " production eval splits are fixed-size",
    }
    # The exclusion list must not drift silently: an ORACLE_BASELINE name
    # absent from the measured set is surfaced. A name missing from BOTH
    # captures entirely was renamed/retired — hard error (the worst-growth
    # gate would quietly stop excluding it). A name present in a capture
    # but dropped by best()'s partial-run intersection is a measurement
    # artifact, not registry drift — it lands as a VISIBLE warning row in
    # the report instead of aborting the whole capture.
    missing_excl = [q for q in ORACLE_BASELINE if q not in growth]
    gone = [q for q in missing_excl if q not in base and q not in ten]
    if gone:
        raise SystemExit(
            f"ORACLE_BASELINE names not in either capture: {gone} — "
            f"update the exclusion list to match the registry "
            f"(was a query renamed?)")
    excl_warnings = [
        f"{q}: in the registry but dropped by a partial bench run — "
        f"growth unmeasured this capture" for q in missing_excl]
    measurable = [q for q in common
                  if growth[q] is not None and q not in ORACLE_BASELINE]
    if not measurable:
        raise SystemExit("no query has a measurable (nonzero-base) growth")
    worst = max(measurable, key=lambda q: growth[q])
    report = {
        "scale_factor_multiplier": 10,
        "src_dir": "/root/testdata/sf0.1",
        "generator": "graft.tools.ScaleUp (key*K+copy remap; per-copy text "
                     "salt; per-copy embedding rotation)",
        "methodology": "per-query min over >=2 warm Bench runs (each itself "
                       "min-of-2 reps); cold-page-cache pass excluded",
        "registry_size": len(common),
        "total_sec_sf01": round(sum(base[q] for q in common), 2),
        "total_sec_10x": round(sum(ten[q] for q in common), 2),
        "total_growth": round(sum(ten[q] for q in common) /
                              sum(base[q] for q in common), 2),
        "max_query_growth": growth[worst],
        "max_query": worst,
        "max_query_growth_note": "computed over production paths only; "
                                 "oracle/ground-truth fixture rows are "
                                 "reported separately below",
        "oracle_baseline_rows": {
            q: {"growth": growth.get(q), "rationale": why}
            for q, why in ORACLE_BASELINE.items() if q in growth},
        "warnings": excl_warnings,
        "queries_failed_at_10x": [q for q in base if q not in ten],
        "per_query_sec_10x": ten,
        "per_query_growth": growth,
    }
    if len(sys.argv) > 4:
        skew, _ = best(sys.argv[4])
        sk_common = [q for q in ten if q in skew]
        sk_growth = {q: round(skew[q] / ten[q], 2) if ten[q] > 0 else None
                     for q in sk_common}
        sk_meas = [q for q in sk_common if sk_growth[q] is not None]
        sk_worst = max(sk_meas, key=lambda q: sk_growth[q]) if sk_meas else None
        report["skewed"] = {
            "generator": "graft.tools.ScaleUp skewed mode (~30% of orders on "
                         "one o_custkey, ~30% of events on one user_id)",
            "registry_size": len(sk_common),
            "total_sec_10x_skewed": round(sum(skew[q] for q in sk_common), 2),
            "total_vs_uniform_10x": round(
                sum(skew[q] for q in sk_common) /
                sum(ten[q] for q in sk_common), 2),
            "max_query_growth_vs_uniform": sk_growth.get(sk_worst),
            "max_query": sk_worst,
            "queries_failed_at_skewed": [q for q in ten if q not in skew],
            "per_query_sec_skewed": skew,
            "per_query_growth_vs_uniform": sk_growth,
        }
    if len(sys.argv) > 5:
        with open(sys.argv[5]) as f:
            report["skew_weapons"] = json.load(f)
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}: total {report['total_sec_sf01']}s -> "
          f"{report['total_sec_10x']}s ({report['total_growth']}x), "
          f"worst {worst} {growth[worst]}x")
    if "skewed" in report:
        s = report["skewed"]
        print(f"skewed: {s['total_sec_10x_skewed']}s "
              f"({s['total_vs_uniform_10x']}x vs uniform 10x), "
              f"worst {s['max_query']} {s['max_query_growth_vs_uniform']}x")


if __name__ == "__main__":
    main()
