#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: selfcheck.py <sfDir> <verifyOutDir>
Reads each <out>/<name>/ parquet written by graft.Verify and compares
(sorted cols, sorted rows, exact values) to DuckDB running
oracle_sql.json against views named after the table stems.
"""
import sys, os, json, glob
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf, "*.parquet")):
    stem = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {stem} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
fail = 0
names = sorted(d for d in os.listdir(out)
               if os.path.isdir(os.path.join(out, d)))
for name in names:
    res_glob = os.path.join(out, name, "*.parquet")
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{res_glob}')").df()
    except Exception as e:
        print(f"FAIL {name}: cannot read result: {e}")
        fail += 1
        continue
    if name not in oracle:
        print(f"SKIP {name}: no oracle ({len(got)} rows)")
        continue
    try:
        want = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fail += 1
        continue
    g = got.reindex(sorted(got.columns), axis=1)
    w = want.reindex(sorted(want.columns), axis=1)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}")
        fail += 1
        continue
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    w = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    if len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
        fail += 1
        continue
    # Numeric columns: small absolute tolerance (ulp-at-rounding-boundary
    # and -0.0 vs 0.0 differ between Spark and DuckDB); rest: exact string.
    import numpy as np
    diff = None
    for c in g.columns:
        if np.issubdtype(g[c].dtype, np.floating) or \
           np.issubdtype(w[c].dtype, np.floating):
            gv = g[c].astype(float).fillna(float("nan")) + 0.0  # -0.0 -> 0.0
            wv = w[c].astype(float).fillna(float("nan")) + 0.0
            d = ~(np.isclose(gv, wv, rtol=0, atol=1e-4, equal_nan=True))
        else:
            d = g[c].astype(str) != w[c].astype(str)
        diff = d if diff is None else (diff | d)
    if diff is None or not diff.any():
        print(f"OK   {name}: {len(g)} rows")
    else:
        print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ")
        print("  got:", g[diff].head(3).to_dict("records"))
        print("  want:", w[diff].head(3).to_dict("records"))
        fail += 1
print("RESULT:", "PASS" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)
