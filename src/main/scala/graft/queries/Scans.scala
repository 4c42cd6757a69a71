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
  )
}
