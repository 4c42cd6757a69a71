#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle differential compare.

Usage:
    python3 tools/local_verify.py <sfDir> <outDir> [query ...]
    python3 tools/local_verify.py --perturb <sfDir> <outDir> [query ...]

--perturb (r13): tamper probe for the construction-keyed subset. Drops
one input row (max doc_id / vec_id) from the ORACLE's copy of
documents/embeddings and asserts the comparator FAILS for every key
whose oracle references those tables — a key that stays green is
TAMPER-BLIND (its green hash never depended on those inputs). The
Spark dump is NOT re-run; only the oracle input is perturbed.

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
import re
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


# Per-table tamper SQL (r14): {src}/{dst} are filled in by
# perturbed_views. Domain rotations use the TPC-H value sets so string
# formats stay parseable; every table loses its max-key row and (where
# a sampler could rank it) its min-md5 row.
PERTURB_SQL = {
    "orders": """
        COPY (WITH src AS (SELECT * FROM read_parquet('{src}'))
        SELECT * REPLACE (
          o_totalprice * 1.5 + 0.25 AS o_totalprice,
          CASE WHEN o_orderkey % 2 = 1
               THEN o_orderdate + INTERVAL 1 DAY ELSE o_orderdate
          END AS o_orderdate,
          CASE WHEN o_orderkey % 2 = 0 THEN
            CASE o_orderpriority
              WHEN '1-URGENT' THEN '2-HIGH'
              WHEN '2-HIGH' THEN '3-MEDIUM'
              WHEN '3-MEDIUM' THEN '4-NOT SPECIFIED'
              WHEN '4-NOT SPECIFIED' THEN '5-LOW'
              ELSE '1-URGENT' END
          ELSE o_orderpriority END AS o_orderpriority,
          CASE WHEN o_orderkey % 3 = 0 THEN
            CASE o_orderstatus WHEN 'O' THEN 'F' WHEN 'F' THEN 'P'
              ELSE 'O' END
          ELSE o_orderstatus END AS o_orderstatus,
          -- remap o_custkey to NEW values on a 1/101 slice: distinct-
          -- custkey sketches (HLL, KMV, capture-recapture) survive row
          -- drops because every custkey has other orders (measured
          -- blind); out-of-domain keys change the distinct set and
          -- drop out of customer joins — both detectable
          CASE WHEN o_orderkey % 101 = 0 THEN o_custkey + 1000000
               ELSE o_custkey END AS o_custkey)
        FROM src
        WHERE o_orderkey <> (SELECT MAX(o_orderkey) FROM src)
        AND o_orderkey <> (SELECT o_orderkey FROM src
          ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey LIMIT 1)
        ) TO '{dst}' (FORMAT PARQUET)""",
    "lineitem": """
        COPY (WITH src AS (SELECT * FROM read_parquet('{src}'))
        SELECT * REPLACE (
          l_extendedprice * 1.5 + 0.25 AS l_extendedprice,
          l_quantity + 1 AS l_quantity,
          CASE WHEN l_orderkey % 2 = 1
               THEN l_shipdate + INTERVAL 1 DAY ELSE l_shipdate
          END AS l_shipdate,
          -- one NEW category value: a domain-PRESERVING rotation is
          -- invisible to distinct-set keys (distinct_rows,
          -- agg_stringagg stayed blind under rotation alone — measured)
          CASE WHEN l_orderkey = (SELECT MIN(l_orderkey) FROM src)
               THEN 'Z'
          WHEN l_orderkey % 2 = 0 THEN
            CASE l_returnflag WHEN 'A' THEN 'N' WHEN 'N' THEN 'R'
              ELSE 'A' END
          ELSE l_returnflag END AS l_returnflag,
          -- remap FK keys on a slice: the graph family projects
          -- DISTINCT (l_suppkey, l_partkey) pairs, which survive row
          -- drops (other rows carry the same pair — 11 graph keys
          -- stayed blind, measured); +1-with-wrap on a 1/97 / 1/89
          -- slice rewires edges without leaving the key domain
          -- the extra x-REFLECTION (2047 - pk on a 1/3 slice) is the
          -- one device that moves zorder quantile-shard x-ranges:
          -- in-band remaps and +k shifts leave the z-box skip counts
          -- saturated (maintain_zorder_effectiveness measured blind
          -- under both)
          CASE WHEN l_orderkey % 97 = 0
               THEN (l_partkey % (SELECT MAX(l_partkey) FROM src)) + 1
               WHEN l_orderkey % 3 = 0 THEN 2047 - l_partkey
               ELSE l_partkey END AS l_partkey,
          CASE WHEN l_orderkey % 89 = 0
               THEN (l_suppkey % (SELECT MAX(l_suppkey) FROM src)) + 1
               ELSE l_suppkey END AS l_suppkey)
        FROM src
        WHERE l_orderkey <> (SELECT MAX(l_orderkey) FROM src)
        AND (l_orderkey, l_linenumber) <> (SELECT (l_orderkey,
          l_linenumber) FROM src
          ORDER BY md5(CAST(l_orderkey AS VARCHAR) || '-' ||
            CAST(l_linenumber AS VARCHAR)), l_orderkey, l_linenumber
          LIMIT 1)
        -- drop ALL rows of the min supplier: the co-purchase supplier
        -- graph is a COMPLETE clique at every graded SF (min shared-
        -- part count 98 vs the >=25 edge threshold, measured), so no
        -- row-slice remap can flip an edge — the only tamper the
        -- graph family can see is a change in the supplier NODE count
        AND l_suppkey <> (SELECT MIN(l_suppkey) FROM src)
        ) TO '{dst}' (FORMAT PARQUET)""",
    "events": """
        COPY (WITH src0 AS (SELECT * FROM read_parquet('{src}')),
        src AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                  ORDER BY event_id) AS _rn FROM src0)
        SELECT * EXCLUDE (_rn) REPLACE (
          value * 1.5 + 0.25 AS value,
          -- +61 s crosses minute buckets; the extra +1 day on a 1/5
          -- slice moves rows across DAY buckets (daily-sum keys like
          -- time_mean_crossings are invariant to uniform affine value
          -- scaling and sub-day shifts — measured blind)
          -- the MIN user becomes a bot: a 1-second-regular ts grid
          -- (rate 60/min, gap_std 0) crosses every bot-detection
          -- threshold — cadence-based keys are invariant to shifts
          -- that preserve irregular organic gaps (measured blind)
          CASE WHEN user_id = (SELECT MIN(user_id) FROM src0)
               THEN TIMESTAMP '1995-06-01 00:00:00'
                    + INTERVAL (_rn) SECOND
               WHEN event_id % 5 = 0 THEN ts + INTERVAL 1 DAY
               WHEN event_id % 2 = 1 THEN ts + INTERVAL 61 SECOND
               ELSE ts END AS ts,
          -- rotate event_type within its domain on even ids: funnel /
          -- lifecycle / survival / diversity keys key off the TYPE
          -- sequence and are invariant to value+ts nudges (measured)
          CASE WHEN event_id % 2 = 0 THEN
            CASE event_type WHEN 'view' THEN 'click'
              WHEN 'click' THEN 'purchase' WHEN 'purchase' THEN 'signup'
              WHEN 'signup' THEN 'error' ELSE 'view' END
          ELSE event_type END AS event_type,
          -- remap user_id to NEW values on a 1/103 slice (distinct-
          -- user sketches and per-user paths survive row drops)
          CASE WHEN event_id % 103 = 0 THEN user_id + 1000000
               ELSE user_id END AS user_id)
        FROM src
        WHERE event_id <> (SELECT MAX(event_id) FROM src)
        AND event_id <> (SELECT event_id FROM src
          ORDER BY md5(CAST(event_id AS VARCHAR)), event_id LIMIT 1)
        -- drop ALL events of the max user: user-COUNT keys (SRM,
        -- audience overlap, retention) survive single-event drops
        AND user_id <> (SELECT MAX(user_id) FROM src)
        ) TO '{dst}' (FORMAT PARQUET)""",
    "customer": """
        COPY (WITH src AS (SELECT * FROM read_parquet('{src}'))
        SELECT * REPLACE (
          c_acctbal * 1.5 + 0.25 AS c_acctbal,
          CASE WHEN c_custkey % 2 = 0
               THEN CAST((c_nationkey + 1) % 25 AS INTEGER)
               ELSE c_nationkey END AS c_nationkey)
        FROM src
        WHERE c_custkey <> (SELECT MAX(c_custkey) FROM src)
        AND c_custkey <> (SELECT c_custkey FROM src
          ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey LIMIT 1)
        ) TO '{dst}' (FORMAT PARQUET)""",
    "part": """
        COPY (WITH src AS (SELECT * FROM read_parquet('{src}'))
        SELECT * REPLACE (
          p_retailprice * 1.5 + 0.25 AS p_retailprice,
          CAST(p_size + 1 AS INTEGER) AS p_size,
          CASE WHEN p_partkey % 2 = 0
               THEN array_to_string(
                 list_reverse(string_split(p_name, ' ')), ' ')
               ELSE p_name END AS p_name)
        FROM src
        WHERE p_partkey <> (SELECT MAX(p_partkey) FROM src)
        AND p_partkey <> (SELECT p_partkey FROM src
          ORDER BY md5(CAST(p_partkey AS VARCHAR)), p_partkey LIMIT 1)
        ) TO '{dst}' (FORMAT PARQUET)""",
    "supplier": """
        COPY (WITH src AS (SELECT * FROM read_parquet('{src}'))
        SELECT * REPLACE (
          s_acctbal * 1.5 + 0.25 AS s_acctbal,
          CASE WHEN s_suppkey % 2 = 0
               THEN CAST((s_nationkey + 1) % 25 AS INTEGER)
               ELSE s_nationkey END AS s_nationkey)
        FROM src
        WHERE s_suppkey <> (SELECT MAX(s_suppkey) FROM src)
        ) TO '{dst}' (FORMAT PARQUET)""",
    "nation": """
        COPY (WITH src AS (SELECT * FROM read_parquet('{src}'))
        SELECT * REPLACE (
          CASE WHEN n_nationkey % 2 = 0
               THEN CAST((n_regionkey + 1) % 5 AS INTEGER)
               ELSE n_regionkey END AS n_regionkey)
        FROM src
        WHERE n_nationkey <> (SELECT MAX(n_nationkey) FROM src)
        ) TO '{dst}' (FORMAT PARQUET)""",
    "region": """
        COPY (SELECT * FROM read_parquet('{src}')
        WHERE r_regionkey <> (SELECT MAX(r_regionkey)
          FROM read_parquet('{src}'))
        ) TO '{dst}' (FORMAT PARQUET)""",
}


def perturbed_views(con, sf_dir, tmp_dir):
    """Register table views with ONE input row dropped from documents
    and embeddings (the max doc_id / vec_id row) — the r12 verdict's
    perturbation-tamper: the cross-SF tamper probe is blind to
    construction-keyed keys because the documents/embeddings tables are
    IDENTICAL at sf0.001 and sf0.01 by testdata design (500 docs both),
    so 'compare sf0.001 output to the sf0.01 oracle' proves nothing for
    that subset. Dropping one row from the ORACLE's input instead must
    flip the comparator to FAIL for every key that genuinely reads
    those tables; a key that stays green is tamper-blind and gets
    reported. Only the oracle side is perturbed — no Spark re-run
    needed, which is exactly why this catches a query whose output
    doesn't actually depend on its declared inputs."""
    helper = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "documents":
            # drop the max doc_id row (row-count sensitivity) AND alter
            # EVERY row's content (text token + n_chars). The probe's
            # job is to prove each key's green hash DEPENDS on these
            # inputs at all — a single-row alteration misses keys whose
            # output happens not to touch that row (top-k, threshold
            # pairs), so the strongest cheap probe perturbs everything;
            # a key still green after this is structurally independent
            # of the table's content and must be individually justified
            # text is REVERSED word-by-word, not merely appended to:
            # appending leaves every interior n-gram/shingle intact, so
            # gram-keyed keys (decontaminate, dedup curves, top-k
            # ngrams) stayed green under an append-only probe
            # (measured). Also drop the MIN-md5(doc_id) row: it ranks
            # first in every md5-ordered deterministic sample, so the
            # id-draw sampler keys must see their selection change.
            # ... and ASYMMETRICALLY: even doc_ids are truncated to
            # their first half BEFORE the reversal. A transform applied
            # uniformly to every doc preserves pairwise similarity, so
            # pair-COUNT keys (dedup_source_matrix) stayed green under
            # reversal alone (measured) — breaking one member of a
            # mixed-parity near-dup pair is what flips a count.
            # Dropped rows: max doc_id (row count), the min-md5-ordered
            # doc (rank-based samplers), and the min md5-BUCKET doc
            # (bucket < threshold in every fixed-quota draw).
            q = os.path.join(tmp_dir, f"{t}.parquet")
            helper.execute(
                f"COPY (WITH src AS (SELECT * FROM read_parquet('{p}')),"
                f" halved AS (SELECT * REPLACE (CASE WHEN doc_id % 2 = 0"
                f"   THEN array_to_string((string_split(text, ' '))"
                f"     [1:GREATEST(len(string_split(text, ' ')) // 2, 1)],"
                f"     ' ') ELSE text END AS text) FROM src) "
                f"SELECT * REPLACE ("
                f"  array_to_string(list_reverse(string_split(text, ' ')),"
                f"    ' ') || ' zzperturb' AS text,"
                f"  n_chars + 1 AS n_chars) "
                f"FROM halved "
                f"WHERE doc_id <> (SELECT MAX(doc_id) FROM src) "
                f"AND doc_id <> (SELECT doc_id FROM src "
                f"ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 1) "
                f"AND doc_id <> (SELECT doc_id FROM src "
                f"ORDER BY CAST(('0x' || substring(md5(CAST(doc_id AS "
                f"VARCHAR)), 1, 8)) AS BIGINT) % 100, doc_id LIMIT 1)) "
                f"TO '{q}' (FORMAT PARQUET)")
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{q}')")
        elif t == "embeddings":
            # drop the max vec_id row AND remap every vector's first
            # component x -> 1.5x + 0.25. The map must NOT be an
            # isometry: a pure translation (+0.25) left every euclidean
            # key green because L2 distances are translation-invariant
            # (measured — sim_search_l2 stayed blind); the affine scale
            # changes pairwise L2 AND cosine geometry for every pair.
            # Also drop the MIN vec_id row: Similarity.probes is
            # min-per-label, so even the value-free ANN PROPERTY
            # oracles (probe list + flags) see their probe set change —
            # the structural layer they do check responds to tampering
            q = os.path.join(tmp_dir, f"{t}.parquet")
            helper.execute(
                f"COPY (SELECT * REPLACE ("
                f"  list_prepend(CAST(embedding[1] * 1.5 + 0.25 AS FLOAT), "
                f"    embedding[2:]) AS embedding) "
                f"FROM read_parquet('{p}') "
                f"WHERE vec_id <> (SELECT MAX(vec_id) "
                f"FROM read_parquet('{p}')) "
                f"AND vec_id <> (SELECT MIN(vec_id) "
                f"FROM read_parquet('{p}'))) TO '{q}' (FORMAT PARQUET)")
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{q}')")
        elif t in PERTURB_SQL:
            # r14 (r13 verdict directive #5): the cross-SF tamper probe
            # covers data-scaled keys, but a future construction-keyed
            # key over the TPC-H/events tables would be blind to it.
            # Per-table perturbations follow the documents/embeddings
            # lessons: (a) DROP rows — the max-key row (row-count
            # sensitivity) and the min-md5-ordered row (rank-based
            # samplers pick it first) — which flips every per-row and
            # count-bearing key; (b) AFFINE-scale a numeric value
            # column (x -> 1.5x + 0.25: non-isometric, so distance/
            # ratio keys flip too); (c) shift timestamps on odd keys
            # (crosses minute/hour/day bucket boundaries for some
            # rows); (d) rotate a categorical on even keys WITHIN its
            # domain (group reassignment without format breakage — an
            # appended marker would crash format-parsing keys into ERR
            # instead of a clean FAIL).
            q = os.path.join(tmp_dir, f"{t}.parquet")
            helper.execute(PERTURB_SQL[t].format(src=p, dst=q))
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{q}')")
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{p}')")


def main():
    perturb = "--perturb" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--perturb"]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    if perturb:
        import tempfile
        tmp_dir = tempfile.mkdtemp(prefix="graft_perturb_")
        perturbed_views(con, sf_dir, tmp_dir)
    else:
        for t in TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    if perturb:
        # restrict to keys whose oracle actually reads the perturbed
        # tables; everything else is out of scope for this probe.
        # Since r14 every source table is perturbed, so the only
        # out-of-scope keys are the literal-generated ones (no table
        # reference at all) — report them so the census is explicit.
        any_table = re.compile(r"\b(" + "|".join(TABLES) + r")\b")
        no_ref = sorted(k for k, v in oracle.items()
                        if not any_table.search(v))
        oracle = {k: v for k, v in oracle.items() if any_table.search(v)}
        print(f"perturb mode: {len(oracle)} keys reference a source "
              f"table; expecting the comparator to FAIL on every one")
        if no_ref and not only:
            print(f"out of scope ({len(no_ref)} keys, oracle reads no "
                  f"table — literal-generated): {no_ref}")

    n_pass = n_fail = 0
    blind = []
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
        if perturb:
            # inverted expectation: the perturbed oracle must DIVERGE
            if not hsh:
                print(f"PASS {name}: comparator detects the perturbation "
                      f"(rows_match={rows})")
                n_pass += 1
            else:
                print(f"BLIND {name}: output identical after the input "
                      f"perturbation ({len(gdf)} rows)")
                blind.append(name)
        elif hsh:
            print(f"PASS {name} ({len(gdf)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: rows_match={rows} schema_match={schema} "
                  f"hash_match=False — {detail}")
            n_fail += 1
    if perturb:
        allow_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "tamper_expected_blind.json")
        allowed = {}
        if os.path.exists(allow_path):
            allowed = {k: v for k, v in json.load(open(allow_path)).items()
                       if not k.startswith("_")}
        unexpected = [k for k in blind if k not in allowed]
        stale = sorted(k for k in allowed
                       if k in oracle and (not only or k in only)
                       and k not in blind)
        if blind:
            print(f"TAMPER-BLIND keys ({len(blind)}): {blind}")
        if unexpected:
            print(f"FAIL: {len(unexpected)} blind keys NOT in "
                  f"tamper_expected_blind.json: {unexpected}")
            n_fail += len(unexpected)
        if stale:
            print(f"FAIL: {len(stale)} stale expected-blind entries now "
                  f"detect the perturbation — drop them: {stale}")
            n_fail += len(stale)
    print(f"== {n_pass} passed, {n_fail} failed ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
