#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT part of the engine).

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query result parquet, runs the oracle SQL in DuckDB over the same
sf tables and compares schema + values (column-name-sorted, row-sorted).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    try:
        spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    except Exception as e:
        print(f"✗ {name}: no spark output ({e})")
        fail += 1
        continue
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(spark_df)} rows")
        continue
    try:
        oracle_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"✗ {name}: oracle SQL failed: {e}")
        fail += 1
        continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"✗ {name}: column mismatch {list(a.columns)} vs {list(b.columns)}")
        fail += 1
        continue
    if len(a) != len(b):
        print(f"✗ {name}: row count {len(a)} vs {len(b)}")
        fail += 1
        continue
    for df_ in (a, b):  # make list/array cells sortable+comparable
        for c_ in df_.columns:
            if df_[c_].dtype == object:
                df_[c_] = df_[c_].map(
                    lambda x: tuple(x.tolist()) if hasattr(x, "tolist") and not
                    isinstance(x, (str, bytes)) else x)
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    dt_mismatch = [(c, str(a[c].dtype), str(b[c].dtype))
                   for c in a.columns if str(a[c].dtype) != str(b[c].dtype)]
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        ok = True
    except AssertionError as e:
        ok = False
        msg = str(e).split("\n")[0:6]
    if ok:
        tag = "OK " if not dt_mismatch else "OK?"
        extra = f"  DTYPE DIFF {dt_mismatch}" if dt_mismatch else ""
        print(f"✓ [{tag}] {name}: {len(a)} rows{extra}")
        if dt_mismatch:
            fail += 0  # warn only; driver may or may not care
    else:
        print(f"✗ {name}: VALUE MISMATCH ({len(a)} rows)")
        for line in msg:
            print("    " + line)
        fail += 1
print(f"\n{'FAIL ' + str(fail) if fail else 'ALL PASS'}")
sys.exit(1 if fail else 0)
