#!/usr/bin/env python3
"""Synthesize an out-of-range sf1 dataset (10x sf0.1) for scaling
validation — the r12 verdict's directive #6.

The driver's generator (seed 42) is not available, so sf1 is built as
a SHARDED 10x universe from sf0.1: ten FK-consistent copies with every
key offset by copy*range, value columns untouched (identical marginal
distributions), and CONTENT perturbed so the similarity/dedup shape is
preserved rather than exploded:

  * documents: every 3rd word (by deterministic position+copy hash)
    is suffixed with the copy tag, so every 4-gram/5-shingle window
    crosses a substituted word — cross-copy Jaccard collapses to ~0
    and the near-dup pair count scales like the generator's, not
    quadratically in copies. n_chars is recomputed from the new text.
  * embeddings: per-(vec,dim,copy) deterministic hash noise (±0.1)
    on every component — cross-copy cosine stays high-but-below any
    dedup threshold while label cluster geometry survives.
  * events: user_id offset per copy, timestamps kept (10x density on
    the same clock, which is how real traffic scales).

This dataset is for WALL-TIME scaling fits only (tools/scaling_fit.py
with an sf1 column); it has no DuckDB-oracle role and lives outside
the repo in /tmp.

Usage: python3 tools/make_sf1.py [outdir]   (default /tmp/graft_sf1)
"""
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10
# per-copy key offsets are inlined in each copy_union SELECT below;
# each equals the table's sf0.1 key-range size (max key + 1)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
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

    # dimension tables follow the TPC-H constants — copy verbatim
    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied")

    copy_union("customer", lambda i: f"""
        SELECT c_custkey + {i * 15000} AS c_custkey, * EXCLUDE (c_custkey)
        FROM read_parquet('{SRC}/customer.parquet')""")

    copy_union("supplier", lambda i: f"""
        SELECT s_suppkey + {i * 1000} AS s_suppkey, * EXCLUDE (s_suppkey)
        FROM read_parquet('{SRC}/supplier.parquet')""")

    copy_union("part", lambda i: f"""
        SELECT p_partkey + {i * 20000} AS p_partkey, * EXCLUDE (p_partkey)
        FROM read_parquet('{SRC}/part.parquet')""")

    copy_union("orders", lambda i: f"""
        SELECT o_orderkey + {i * 150000} AS o_orderkey,
               o_custkey + {i * 15000} AS o_custkey,
               * EXCLUDE (o_orderkey, o_custkey)
        FROM read_parquet('{SRC}/orders.parquet')""")

    copy_union("lineitem", lambda i: f"""
        SELECT l_orderkey + {i * 150000} AS l_orderkey,
               l_partkey + {i * 20000} AS l_partkey,
               l_suppkey + {i * 1000} AS l_suppkey,
               * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
        FROM read_parquet('{SRC}/lineitem.parquet')""")

    copy_union("events", lambda i: f"""
        SELECT event_id + {i * 100000} AS event_id,
               user_id + {i * 1500} AS user_id,
               * EXCLUDE (event_id, user_id)
        FROM read_parquet('{SRC}/events.parquet')""")

    copy_union("documents", lambda i: f"""
        SELECT doc_id + {i * 5000} AS doc_id,
               array_to_string(list_transform(
                 list_zip(string_split(text, ' '),
                          range(1, len(string_split(text, ' ')) + 1)),
                 p -> CASE WHEN (p[2] * 2654435761 + {i} * 97) % 3 = 0
                      THEN p[1] || '_c{i}' ELSE p[1] END), ' ') AS text,
               lang, source,
               CAST(0 AS BIGINT) AS n_chars
        FROM read_parquet('{SRC}/documents.parquet')""")
    # recompute n_chars from the perturbed text in place
    con.execute(f"""
        COPY (SELECT doc_id, text, lang, source,
                     CAST(length(text) AS BIGINT) AS n_chars
              FROM read_parquet('{out}/documents.parquet'))
        TO '{out}/documents2.parquet' (FORMAT PARQUET)""")
    os.replace(f"{out}/documents2.parquet", f"{out}/documents.parquet")

    copy_union("embeddings", lambda i: f"""
        SELECT vec_id + {i * 2000} AS vec_id,
               list_transform(list_zip(embedding,
                   range(1, len(embedding) + 1)),
                 p -> CAST(p[1] + ((CAST(hash(vec_id * 64 + p[2]
                   + {i} * 131) % 2001 AS BIGINT) - 1000)) / 10000.0
                   AS FLOAT)) AS embedding,
               label
        FROM read_parquet('{SRC}/embeddings.parquet')""")

    print(f"sf1 written to {out}")


if __name__ == "__main__":
    main()
