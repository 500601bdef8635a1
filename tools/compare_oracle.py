#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare: run each
SparkEntry oracle SQL in DuckDB over the sf tables, load the Verify output
parquet, sort columns by name (driver contract), and diff values.

The driver hashes TYPED values, so this compare is type-sensitive:
 1. lint: DESCRIBE each oracle SQL and reject HUGEINT/UHUGEINT output
    columns outright (DuckDB widens sum(BIGINT) -> HUGEINT; Spark emits
    BIGINT, so the driver hash always fails even when text values match —
    the r3 cumulative_new_users / json_extract_props failure class).
 2. compare pandas dtype KINDS (int vs int passes — the driver's value hash
    treats INT32/INT64 alike, r3 evidence: 7 INTEGER-vs-BIGINT queries were
    hash-green — but int vs float/object fails, which is exactly how a
    HUGEINT materializes through .df()).
 3. compare values exactly (check_exact, order-insensitive).

Usage: compare_oracle.py <sfDir> <verifyOutDir> [queryName...]
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
    # tolerate partial dirs: the GenScaleData corpora carry only
    # documents/embeddings — queries over absent tables just can't be run.
    # Those corpora are also Spark-written DIRECTORIES, not single files,
    # hence the glob fallback.
    try:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    except Exception:
        try:
            con.sql(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{sf}/{t}.parquet/*.parquet'")
        except Exception:
            pass

BAD_TYPES = ("HUGEINT", "UHUGEINT")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
fail = ok = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    # Lint first (no Spark output needed): reject widened integer types in
    # the oracle's own output schema before comparing anything.
    try:
        desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        widened = [(c, t) for c, t, *_ in desc
                   if any(b in t.upper() for b in BAD_TYPES)]
        if widened:
            print(f"FAIL {name}: oracle output has widened integer column(s) "
                  f"{widened} — wrap in CAST(... AS BIGINT)")
            fail += 1;  continue
    except Exception as e:
        print(f"FAIL {name}: lint DESCRIBE error: {e}");  fail += 1;  continue
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
    kind_diff = [(c, got[c].dtype, want[c].dtype) for c in got.columns
                 if got[c].dtype.kind != want[c].dtype.kind]
    if kind_diff:
        print(f"FAIL {name}: dtype-kind mismatch (spark vs oracle): {kind_diff}")
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
