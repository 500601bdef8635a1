#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare: run each
SparkEntry oracle SQL in DuckDB over the sf tables, load the Verify output
parquet, sort columns by name (driver contract), and diff values.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])  # optional: restrict to these query names
con = duckdb.connect()
con.sql("SET TimeZone='UTC'")
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
fail = ok = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pdir = os.path.join(out, name)
    files = glob.glob(os.path.join(pdir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output");  fail += 1;  continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}");  fail += 1;  continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fail += 1;  continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}");  fail += 1;  continue
    # order-insensitive compare (sort by all columns), exact values
    g = got.sort_values(by=list(got.columns), ignore_index=True)
    w = want.sort_values(by=list(want.columns), ignore_index=True)
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        print(f"ok   {name}: {len(got)} rows");  ok += 1
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'diff'}")
        diff = (g != w) & ~(g.isna() & w.isna())
        bad = diff.any(axis=1)
        if bad.any():
            i = bad.idxmax()
            print(f"     first diff row {i}:\n  got: {g.loc[i].to_dict()}\n  want: {w.loc[i].to_dict()}")
        fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
