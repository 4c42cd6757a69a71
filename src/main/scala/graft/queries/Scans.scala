package graft.queries

import graft.Tables._
import graft.engine.catalog.Catalog
import graft.engine.meta.{ColumnMeta, TableMeta}

/** Scan / source / catalog operators (SURVEY.md §2.1).
  *
  * `scan_parquet` is the baseline columnar scan: vectorized parquet
  * reader + whole-stage codegen; at scale, filters/projections from
  * downstream operators push into this scan (asserted in PlanSpec).
  * IO roundtrips (csv/jsonl) and the partitioned sink are side-effecting
  * and covered by ScalaTest, not the oracle (§2.1).
  */
object Scans {

  /** Declared metadata for catalog registration of `nation`. */
  val nationMeta: TableMeta = TableMeta("graft_nation", Seq(
    ColumnMeta("n_nationkey", "int"),
    ColumnMeta("n_name", "character"),
    ColumnMeta("n_regionkey", "int")))

  /** Declared metadata for the external-table DDL over `supplier` —
    * types match the parquet footer (external DDL binds by name, it
    * does not cast). */
  val supplierMeta: TableMeta = TableMeta("graft_supplier_ext", Seq(
    ColumnMeta("s_suppkey", "long"),
    ColumnMeta("s_name", "character"),
    ColumnMeta("s_nationkey", "int"),
    ColumnMeta("s_acctbal", "double")))

  /** External-table metadata over `orders` (footer-matching types —
    * same binding rule as supplierMeta). */
  val ordersMeta: TableMeta = TableMeta("graft_orders_vsrc", Seq(
    ColumnMeta("o_orderkey", "long"),
    ColumnMeta("o_custkey", "long"),
    ColumnMeta("o_orderstatus", "character"),
    ColumnMeta("o_totalprice", "double"),
    ColumnMeta("o_orderdate", "datetime"),
    ColumnMeta("o_orderpriority", "character")))

  val qs: Seq[Q] = Seq(
    Q("scan_parquet",
      (s, d) => lineitem(s, d).orderBy("l_orderkey", "l_linenumber"),
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber"),

    // Metadata-declared table registered into the session catalog, then
    // queried by name through spark.sql — Glue-registration parity.
    Q("catalog_register",
      (s, d) => {
        Catalog.register(s, nationMeta, s"$d/nation.parquet")
        s.sql("""SELECT n_regionkey, COUNT(*) AS n_nations,
                        MIN(n_name) AS first_name
                 FROM graft_nation GROUP BY n_regionkey
                 ORDER BY n_regionkey""")
      },
      """SELECT n_regionkey, COUNT(*) AS n_nations,
                MIN(n_name) AS first_name
         FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""),

    // Persistent EXTERNAL table over the parquet location — the other
    // half of Glue parity (catalog_register covers temp views): the
    // declared metadata becomes `CREATE TABLE ... USING parquet
    // LOCATION ...` DDL, the data never moves, and the table is
    // queryable by name across the whole session. The declared schema
    // binds by COLUMN NAME to the parquet footer, exactly how a
    // metastore table over an existing lake path behaves.
    Q("catalog_external",
      (s, d) => {
        Catalog.dropExternal(s, "graft_supplier_ext")
        Catalog.registerExternal(s, Scans.supplierMeta,
          s"$d/supplier.parquet", Some("graft_supplier_ext"))
        s.sql("""SELECT s_nationkey, COUNT(*) AS n_suppliers,
                        MIN(s_name) AS first_name
                 FROM graft_supplier_ext GROUP BY s_nationkey
                 ORDER BY s_nationkey""")
      },
      """SELECT s_nationkey, COUNT(*) AS n_suppliers,
                MIN(s_name) AS first_name
         FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""),

    // CATALOG VIEW — the Athena/Glue surface the reference's analysts
    // lived in: a named view whose TEXT is stored in the catalog and
    // re-resolved per query (schema changes flow through; a CTAS table
    // would freeze them). The view composes an aggregate over the
    // external table; querying it must produce exactly the underlying
    // statement's relation. At 100 TB a view is free — it's the
    // pushdown-transparent form of sharing a query, vs materializing.
    Q("catalog_view",
      (s, d) => {
        Catalog.dropExternal(s, "graft_orders_vsrc")
        Catalog.registerExternal(s, Scans.ordersMeta,
          s"$d/orders.parquet", Some("graft_orders_vsrc"))
        s.sql("DROP VIEW IF EXISTS graft_rev_by_status")
        s.sql("""CREATE VIEW graft_rev_by_status AS
                 SELECT o_orderstatus,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                          AS DOUBLE) AS revenue,
                        COUNT(*) AS n
                 FROM graft_orders_vsrc GROUP BY o_orderstatus""")
        s.sql("""SELECT o_orderstatus, revenue, n
                 FROM graft_rev_by_status
                 WHERE n > 10 ORDER BY o_orderstatus""")
      },
      """SELECT o_orderstatus,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue,
                COUNT(*) AS n
         FROM orders GROUP BY o_orderstatus
         HAVING COUNT(*) > 10 ORDER BY o_orderstatus"""),

    // PARAMETERIZED SQL (named-marker form) — the injection-safe query
    // surface a reference user templated their Athena statements with:
    // the statement text carries :named markers, values bind at
    // execution (typed, never string-spliced). Catalyst folds the
    // bound literals before optimization, so parameterization costs
    // nothing at plan time — the filter still pushes into the scan.
    Q("sql_params",
      (s, d) => {
        orders(s, d).createOrReplaceTempView("graft_orders_par")
        s.sql(
          """SELECT o_orderpriority, COUNT(*) AS n,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) AS revenue
             FROM graft_orders_par
             WHERE o_totalprice BETWEEN :lo AND :hi
               AND o_orderstatus = :status
             GROUP BY o_orderpriority ORDER BY o_orderpriority""",
          Map("lo" -> 50000, "hi" -> 200000, "status" -> "O"))
      },
      """SELECT o_orderpriority, COUNT(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS revenue
         FROM orders
         WHERE o_totalprice BETWEEN 50000 AND 200000
           AND o_orderstatus = 'O'
         GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // ANALYZE TABLE — the optimizer-statistics feed: external table →
    // COMPUTE STATISTICS FOR COLUMNS → the catalog's stored stats read
    // back AS DATA and oracle-checked against DuckDB's exact
    // count/nulls/ndv/min/max. The stats themselves are what
    // spark.sql.cbo.enabled consumes for hint-free broadcast decisions
    // and join reorder — that plan-level effect is PlanSpec-asserted.
    Q("catalog_analyze",
      (s, d) => {
        Catalog.dropExternal(s, "graft_supplier_stats")
        Catalog.registerExternal(s, Scans.supplierMeta,
          s"$d/supplier.parquet", Some("graft_supplier_stats"))
        Catalog.analyzeColumns(s, "graft_supplier_stats",
          Seq("s_suppkey", "s_nationkey"))
        Catalog.columnStats(s, "graft_supplier_stats")
          .orderBy("col_name")
      },
      """SELECT * FROM (
           SELECT 's_nationkey' AS col_name,
                  CAST(COUNT(*) AS BIGINT) AS n_rows,
                  CAST(COUNT(*) - COUNT(s_nationkey) AS BIGINT) AS n_nulls,
                  TRUE AS ndv_ok,
                  CAST(MIN(s_nationkey) AS VARCHAR) AS min_val,
                  CAST(MAX(s_nationkey) AS VARCHAR) AS max_val
           FROM supplier
           UNION ALL
           SELECT 's_suppkey',
                  CAST(COUNT(*) AS BIGINT),
                  CAST(COUNT(*) - COUNT(s_suppkey) AS BIGINT),
                  TRUE,
                  CAST(MIN(s_suppkey) AS VARCHAR),
                  CAST(MAX(s_suppkey) AS VARCHAR)
           FROM supplier)
         ORDER BY col_name"""),

    // CTAS — THE Athena working pattern (SELECT → new table in one
    // statement) over the passthrough surface: registerAll, CREATE
    // TABLE AS a decimal-exact aggregate, read the result back from
    // the catalog. The materialized table lands in the session
    // warehouse as parquet; at scale this is the "publish a derived
    // table" verb, and the write inherits the aggregate's partitioning
    // (no extra exchange for the sink).
    Q("sql_ctas",
      (s, d) => {
        graft.engine.sql.Query.registerAll(s, d)
        s.sql("DROP TABLE IF EXISTS graft_ctas_cust")
        // the in-memory catalog is per-session but the warehouse dir is
        // not: a leftover table directory from an earlier session makes
        // CTAS fail on "location already exists" even after the DROP —
        // clear the path as well (what DROP does when the table IS known)
        graft.engine.io.Storage.deleteFolder(s,
          s.conf.get("spark.sql.warehouse.dir") + "/graft_ctas_cust")
        s.sql("""CREATE TABLE graft_ctas_cust USING parquet AS
                 SELECT o_custkey,
                        COUNT(*) AS n_orders,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                             AS DOUBLE) AS total_spend
                 FROM orders GROUP BY o_custkey""")
        s.table("graft_ctas_cust").orderBy("o_custkey")
      },
      """SELECT o_custkey, COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     AS DOUBLE) AS total_spend
         FROM orders GROUP BY o_custkey ORDER BY o_custkey"""),
  )
}
