#!/usr/bin/env python3
"""Synthesize a PARTIAL sf10 dataset (10x sf1 = 100x sf0.1) for the
two-decade extrapolation of the steepest scaling keys — the r13
verdict's directive #6.

Only the tables those keys read are materialized (plus region for the
bench warmup): orders + lineitem (graph_hits) and embeddings (vec_pq,
vec_mips, vec_kmeans, sample_coreset). This is NOT a full dataset —
Verify/full Bench must not run against it; use
SPARK_GRAFT_BENCH_ONLY=<steepest keys>.

Sharding follows tools/make_sf1.py: ten FK-consistent copies of sf1
with keys offset by copy * (sf1 key-range size) and embeddings
hash-noised per copy with a DIFFERENT salt layer (193 vs 131) so the
second-level copies don't collapse onto the first-level ones.

Usage: python3 tools/make_sf10.py [outdir]   (default /tmp/graft_sf10)
Requires /tmp/graft_sf1 (tools/make_sf1.py) to exist.
"""
import os
import shutil
import sys

import duckdb

SRC = "/tmp/graft_sf1"
COPIES = 10


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def copy_union(table, select_per_copy):
        parts = " UNION ALL ".join(
            select_per_copy(i) for i in range(COPIES))
        con.execute(f"COPY ({parts}) TO '{out}/{table}.parquet' "
                    f"(FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    shutil.copyfile(f"{SRC}/region.parquet", f"{out}/region.parquet")
    print("region: copied")

    # sf1 key ranges: orders/lineitem orderkey 1.5M, custkey 150k,
    # partkey 200k, suppkey 10k, vec_id 20k
    copy_union("orders", lambda i: f"""
        SELECT o_orderkey + {i * 1500000} AS o_orderkey,
               o_custkey + {i * 150000} AS o_custkey,
               * EXCLUDE (o_orderkey, o_custkey)
        FROM read_parquet('{SRC}/orders.parquet')""")

    copy_union("lineitem", lambda i: f"""
        SELECT l_orderkey + {i * 1500000} AS l_orderkey,
               l_partkey + {i * 200000} AS l_partkey,
               l_suppkey + {i * 10000} AS l_suppkey,
               * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
        FROM read_parquet('{SRC}/lineitem.parquet')""")

    copy_union("embeddings", lambda i: f"""
        SELECT vec_id + {i * 20000} AS vec_id,
               list_transform(list_zip(embedding,
                   range(1, len(embedding) + 1)),
                 p -> CAST(p[1] + ((CAST(hash(vec_id * 64 + p[2]
                   + {i} * 193) % 2001 AS BIGINT) - 1000)) / 10000.0
                   AS FLOAT)) AS embedding,
               label
        FROM read_parquet('{SRC}/embeddings.parquet')""")

    print(f"partial sf10 written to {out}")


if __name__ == "__main__":
    main()
