#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle differential compare.

Usage:
    python3 tools/local_verify.py <sfDir> <outDir> [query ...]

Expects <outDir> to contain, per query key, a folder of parquet written by
`graft.Verify` plus `oracle_sql.json` mapping key -> DuckDB SQL.

Round-2 rewrite: the round-1 version canonicalized values (Decimal
.normalize(), %.12g floats) and passed 14 queries the driver failed. This
version mirrors the driver's comparator shape instead:

  * both sides land in pandas (spark parquet via pyarrow, oracle via
    duckdb .df()) — NO type coercion, so a DECIMAL column on one side vs
    a float64 on the other is a mismatch, exactly as the driver sees it;
  * rows_match   = row counts equal
  * schema_match = sorted column names equal
  * hash_match   = after sorting columns by name and rows by
    sort_values(all columns), every cell matches with dtype-sensitive
    equality (type name + str value). Unsortable columns (numpy arrays)
    raise — reported as ERR, which is what the driver records.

Exit code 0 iff every checked query hash-matches.
"""
import datetime
import duckdb
import glob
import json
import os
import sys

import pandas as pd


TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def cell_key(v):
    """Dtype-sensitive canonical form for one cell: a Decimal('25.50')
    never equals a float 25.5, mirroring the driver's hash compare.
    Exception (empirical, from round-1 driver results): DATE columns —
    spark parquet yields datetime.date, duckdb datetime64 — compared
    equal by the driver (fn_date/gen_date_spine passed r1), so both are
    canonicalized to the midnight-timestamp string."""
    if v is None or v != v:  # None / NaN / NaT
        return ("null",)
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return ("Timestamp", f"{v.isoformat()} 00:00:00")
    return (type(v).__name__, str(v))


def compare(gdf, edf):
    """Returns (rows_match, schema_match, hash_match, detail)."""
    rows_match = len(gdf) == len(edf)
    gcols, ecols = sorted(gdf.columns), sorted(edf.columns)
    schema_match = gcols == ecols
    if not schema_match:
        return rows_match, False, False, f"cols spark={gcols} oracle={ecols}"
    # driver shape: sort_values over every column — arrays raise here
    g = gdf[gcols].sort_values(by=gcols, kind="mergesort").reset_index(drop=True)
    e = edf[ecols].sort_values(by=ecols, kind="mergesort").reset_index(drop=True)
    if not rows_match:
        return False, True, False, f"rows spark={len(g)} oracle={len(e)}"
    for c in gcols:
        gv, ev = list(g[c]), list(e[c])
        for i, (a, b) in enumerate(zip(gv, ev)):
            if cell_key(a) != cell_key(b):
                return True, True, False, (
                    f"col {c} row {i}: spark={cell_key(a)} oracle={cell_key(b)}"
                    f" (dtypes spark={gdf[c].dtype} oracle={edf[c].dtype})")
    return True, True, True, ""


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
        files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            gdf = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
            edf = con.execute(oracle[name]).df()
            rows, schema, hsh, detail = compare(gdf, edf)
        except Exception as ex:
            print(f"ERR  {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if hsh:
            print(f"PASS {name} ({len(gdf)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows_match={rows} schema_match={schema} "
                  f"hash_match=False — {detail}")
            n_fail += 1
    print(f"== {n_pass} passed, {n_fail} failed ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
