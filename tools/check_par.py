#!/usr/bin/env python3
"""Parallel per-query variant of check.py for big local corpora (sf1):
same compare semantics, but each query runs in its own worker process with
a capped DuckDB thread count and its wall time is logged, so a handful of
heavy text oracles can't serialize the whole pass. Dev tool only.

  python3 tools/check_par.py <sf_dir> <out_dir> [workers] [threads] [names]

The per-oracle time budget (BASELINE.md "Oracle budget": 60 s at the sf1
gate) is ENFORCED, not just logged: any oracle whose wall time exceeds
GRAFT_ORACLE_BUDGET_SEC (default 60) fails the pass with a SLOW line, so
a 500-second oracle is caught at ship time instead of at the next
round's rewrite campaign (round-14 verdict, Missing #3 — the 776.8 s
set this gate would have caught at first commit). Set
GRAFT_ORACLE_BUDGET_SEC=0 to disable (e.g. probing an sf10 corpus the
budget was never stated for).
"""
import json, sys, math, os, time
from concurrent.futures import ProcessPoolExecutor

sf_dir = sys.argv[1]
out_dir = sys.argv[2]
workers = int(sys.argv[3]) if len(sys.argv) > 3 else 4
threads = int(sys.argv[4]) if len(sys.argv) > 4 else 8
only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
budget = float(os.environ.get("GRAFT_ORACLE_BUDGET_SEC", "60"))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_one(item):
    name, sql = item
    import duckdb
    t0 = time.time()
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    # several heavy oracles may run concurrently; cap each so the sum
    # stays under RAM (DuckDB spills past the limit instead of dying)
    con.execute("SET memory_limit='18GB'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    try:
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        return (name, f"FAIL {name}: {e}", time.time() - t0)
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        return (name, f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}", time.time() - t0)
    if len(got) != len(exp):
        return (name, f"FAIL {name}: rows {len(got)} vs {len(exp)}", time.time() - t0)
    got = got.sort_values(by=list(got.columns), ignore_index=True)
    exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
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
                return (name, f"FAIL {name}: col={c} row={i} spark={x!r} oracle={y!r} ({len(got)} rows)", time.time() - t0)
    return (name, f"OK   {name} ({len(got)} rows)", time.time() - t0)


def main():
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    items = [(n, s) for n, s in sorted(oracle.items()) if not only or n in only]
    fails = 0
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for name, line, sec in ex.map(run_one, items):
            over = budget > 0 and sec > budget
            print(f"{line}  [{sec:.1f}s]"
                  + (f"  SLOW oracle exceeds {budget:.0f}s budget" if over else ""),
                  flush=True)
            if line.startswith("FAIL") or over:
                fails += 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
