#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify output
(<out>/<name>/ parquet + oracle_sql.json), runs each oracle in DuckDB over
the same sf dir, and compares values with columns sorted by name and rows
sorted by all columns. Dev tool only — not part of the shipped library."""
import json, sys, math
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify-out"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    con = duckdb.connect()
    for t in TABLES:
        # driver corpora are single files; locally generated ones (Sf1Gen)
        # are Spark-written directories of part files
        p = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fails += 1
        continue
    got = got.sort_values(by=list(got.columns), ignore_index=True)
    exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
    bad = None
    for c in got.columns:
        a, b = got[c], exp[c]
        for i in range(len(a)):
            x, y = a.iloc[i], b.iloc[i]
            if x is None or (isinstance(x, float) and math.isnan(x)):
                ok = y is None or (isinstance(y, float) and math.isnan(y))
            elif isinstance(x, float):
                ok = isinstance(y, float) and (x == y)
            else:
                ok = str(x) == str(y)
            if not ok:
                bad = (c, i, x, y)
                break
        if bad:
            break
    if bad:
        c, i, x, y = bad
        print(f"FAIL {name}: col={c} row={i} spark={x!r} oracle={y!r} ({len(got)} rows)")
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
sys.exit(1 if fails else 0)
