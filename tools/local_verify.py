#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle differential compare.

Usage:
    python3 tools/local_verify.py <sfDir> <outDir> [query ...]

Expects <outDir> to contain, per query key, a folder of parquet written by
`graft.Verify` plus `oracle_sql.json` mapping key -> DuckDB SQL. Binds each
testdata parquet as a DuckDB view under its bare table name (assumption A1,
SURVEY.md §7.4 R1), runs the oracle SQL, and compares canonically:
columns sorted by name, rows sorted, values stringified with fixed float
formatting. Exit code 0 iff every checked query matches.
"""
import duckdb
import glob
import json
import math
import os
import sys
from datetime import datetime, date
from decimal import Decimal

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def fmt(v):
    """Canonical string for one value."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # 12 significant digits: queries are required to ROUND/-cast their
        # float outputs, so this only needs to absorb printing noise.
        return f"{v:.12g}"
    if isinstance(v, Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(fmt(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(fmt(r[i]) for i in order) for r in rows)
    return out, [cols[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            got_rel = con.execute(
                "SELECT * FROM read_parquet([" +
                ",".join(f"'{f}'" for f in files) + "])")
            got_rows = got_rel.fetchall()
            got_cols = [d[0] for d in got_rel.description]
            exp_rel = con.execute(sql)
            exp_rows = exp_rel.fetchall()
            exp_cols = [d[0] for d in exp_rel.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        g, gc = canon(got_rows, got_cols)
        e, ec = canon(exp_rows, exp_cols)
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
            n_fail += 1
        elif g != e:
            n_fail += 1
            diff = [(i, a, b) for i, (a, b) in enumerate(zip(g, e)) if a != b]
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}, "
                  f"first diffs:")
            for i, a, b in diff[:3]:
                print(f"  row {i}: spark={a}")
                print(f"  row {i}: oracle={b}")
            if len(g) != len(e):
                extra = g[len(e):] or e[len(g):]
                print(f"  length mismatch, first extra: {extra[:2]}")
        else:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} passed, {n_fail} failed ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
