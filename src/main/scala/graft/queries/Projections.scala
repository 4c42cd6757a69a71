package graft.queries

import graft.Tables._
import graft.engine.meta.{ColumnMeta, TableMeta}
import graft.engine.ops.Conform
import org.apache.spark.sql.functions._

/** Projection / filter / conformance operators (SURVEY.md §2.2).
  *
  * All are narrow (no shuffle except the final presentation sort):
  * Catalyst collapses them into the parquet scan — filters reach
  * `PushedFilters`, projections reach `ReadSchema`, so at 100 TB the scan
  * reads only the needed columns/row groups.
  */
object Projections {

  /** Declared metadata for `conform_cast` — the schema-on-declare verb:
    * reorder columns, widen int→long, timestamp→date, double→decimal. */
  val lineitemSlim: TableMeta = TableMeta("lineitem_slim", Seq(
    ColumnMeta("l_orderkey", "long"),
    ColumnMeta("l_linenumber", "long"),          // int → long widen
    ColumnMeta("l_quantity", "decimal(12,2)"),   // double → decimal
    ColumnMeta("l_extendedprice", "decimal(12,2)"),
    ColumnMeta("l_shipdate", "date"),            // timestamp → date
    ColumnMeta("l_returnflag", "character")))

  /** The reference's signature input format: a metadata JSON *document*
    * in the agnostic type dialect (SURVEY §1.1 [RECONSTRUCTED]) is the
    * schema contract; conformance is driven entirely from parsing it —
    * nothing is hard-coded Spark-side. Exercises every conformance
    * dimension: column reorder (date before status), type imposition
    * (long, decimal, timestamp→date), surplus drop (o_orderpriority,
    * o_custkey never selected), and a declared-but-missing column
    * (o_channel) materializing as a typed null. */
  val ordersMetaJson: String = """{
    "name": "orders_conformed",
    "description": "orders conformed from a declared metadata document",
    "columns": [
      {"name": "o_orderkey",   "type": "long"},
      {"name": "o_orderdate",  "type": "date"},
      {"name": "o_orderstatus","type": "character"},
      {"name": "o_totalprice", "type": "decimal(14,2)"},
      {"name": "o_channel",    "type": "character"}
    ],
    "partitions": []
  }"""

  /** Shared planted-defect dirty ingest — conform_validate's report
    * and dq_rules_quarantine's row routing are two halves of one
    * validation story, so the defect rules live ONCE: x-prefixed key
    * every 11th row, null price every 13th, impossible month for
    * o_orderkey % 15 ∈ {0, 13, 14}. */
  private[queries] def dirtyOrdersBase(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    orders(s, d).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 11 === 0,
        concat(lit("x"), col("o_orderkey").cast("string")))
        .otherwise(col("o_orderkey").cast("string")).as("k_raw"),
      when(col("o_orderkey") % 13 === 0, lit(null: String))
        .otherwise(col("o_totalprice").cast("string")).as("price_raw"),
      concat(lit("2024-"),
        lpad((col("o_orderkey") % 15).cast("string"), 2, "0"),
        lit("-15")).as("date_raw"))

  val qs: Seq[Q] = Seq(
    // Metadata-JSON → StructType → conform, end to end: parse the
    // document (TableMeta.fromJson ⇄ TypeMap), then conformLenient so
    // the missing declared column becomes a typed null. Still a pure
    // Project over the scan — fuses into whole-stage codegen, prunes
    // the two surplus columns out of ReadSchema.
    Q("conform_metadata_json",
      (s, d) => {
        val meta = graft.engine.meta.TableMeta.fromJson(ordersMetaJson)
        Conform.conformLenient(orders(s, d), meta)
          // decimal → double for the driver comparator (exact cast)
          .withColumn("o_totalprice", col("o_totalprice").cast("double"))
          .orderBy("o_orderkey")
      },
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
                CAST(o_orderdate AS DATE) AS o_orderdate,
                CAST(o_orderstatus AS VARCHAR) AS o_orderstatus,
                CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE)
                  AS o_totalprice,
                CAST(NULL AS VARCHAR) AS o_channel
         FROM orders ORDER BY o_orderkey"""),

    Q("project_select",
      (s, d) => lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy("l_orderkey", "l_linenumber"),
      """SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
         FROM lineitem ORDER BY l_orderkey, l_linenumber"""),

    Q("filter_predicate",
      (s, d) => orders(s, d).filter(
        (col("o_orderpriority").like("1%") ||
          col("o_orderpriority").isin("2-HIGH", "3-MEDIUM")) &&
          col("o_totalprice").between(50000, 300000) &&
          col("o_orderstatus") =!= "P" &&
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_custkey").isNotNull)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderpriority")
        .orderBy("o_orderkey"),
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                o_orderpriority
         FROM orders
         WHERE (o_orderpriority LIKE '1%'
                OR o_orderpriority IN ('2-HIGH','3-MEDIUM'))
           AND o_totalprice BETWEEN 50000 AND 300000
           AND o_orderstatus <> 'P'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_custkey IS NOT NULL
         ORDER BY o_orderkey"""),

    // The conform op itself produces the declared DECIMAL columns; the
    // final projection re-emits them as DOUBLE (exact decimal→double
    // cast, identical in both engines) for the driver's comparator.
    Q("conform_cast",
      (s, d) => Conform.conform(lineitem(s, d), lineitemSlim)
        .withColumn("l_quantity", col("l_quantity").cast("double"))
        .withColumn("l_extendedprice", col("l_extendedprice").cast("double"))
        .orderBy("l_orderkey", "l_linenumber"),
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
                CAST(l_linenumber AS BIGINT) AS l_linenumber,
                CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS l_quantity,
                CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE)
                  AS l_extendedprice,
                CAST(l_shipdate AS DATE) AS l_shipdate,
                CAST(l_returnflag AS VARCHAR) AS l_returnflag
         FROM lineitem ORDER BY l_orderkey, l_linenumber"""),

    // Error-TOLERANT conformance: try_cast turns unparseable cells into
    // NULL instead of failing the job — the ingest mode for dirty
    // feeds (reject-and-continue, with the NULLs countable as a DQ
    // metric afterwards). Dirt is synthesized deterministically: every
    // 3rd key gets a non-numeric prefix, month slots 0/13/14 make
    // invalid dates. Both engines parse the identical strings.
    Q("conform_trycast",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        expr("""try_cast(concat(CASE WHEN o_orderkey % 3 = 0
                                     THEN 'x' ELSE '' END,
                                CAST(o_orderkey AS STRING)) AS BIGINT)""")
          .as("k_parsed"),
        expr("try_cast(CAST(o_totalprice AS STRING) AS DOUBLE)")
          .as("price_parsed"),
        expr("""try_cast(concat('2024-',
                  lpad(CAST(o_orderkey % 15 AS STRING), 2, '0'),
                  '-15') AS DATE)""").as("date_parsed"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                TRY_CAST(CASE WHEN o_orderkey % 3 = 0
                              THEN 'x' ELSE '' END ||
                         CAST(o_orderkey AS VARCHAR) AS BIGINT) AS k_parsed,
                TRY_CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE)
                  AS price_parsed,
                TRY_CAST('2024-' ||
                         lpad(CAST(o_orderkey % 15 AS VARCHAR), 2, '0') ||
                         '-15' AS DATE) AS date_parsed
         FROM orders ORDER BY o_orderkey"""),

    // Mixed-format date parsing — the classic multi-source ingest mess:
    // three date formats in one column, parsed with a coalesce chain of
    // format-specific TRY parsers (each returns NULL on mismatch, so
    // order only matters for performance). All rows recover the same
    // calendar date; format syntax differs between engines but the
    // construction is shared, so parity is on the parsed VALUES.
    Q("conform_dates_multi",
      (s, d) => orders(s, d)
        .withColumn("ds",
          when(col("o_orderkey") % 3 === 0,
            date_format(col("o_orderdate"), "yyyy-MM-dd"))
          .when(col("o_orderkey") % 3 === 1,
            date_format(col("o_orderdate"), "MM/dd/yyyy"))
          .otherwise(date_format(col("o_orderdate"), "dd.MM.yyyy")))
        .select(col("o_orderkey"), col("ds"),
          coalesce(
            expr("try_to_timestamp(ds, 'yyyy-MM-dd')"),
            expr("try_to_timestamp(ds, 'MM/dd/yyyy')"),
            expr("try_to_timestamp(ds, 'dd.MM.yyyy')"))
            .cast("date").as("parsed"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                CASE WHEN o_orderkey % 3 = 0
                       THEN strftime(o_orderdate, '%Y-%m-%d')
                     WHEN o_orderkey % 3 = 1
                       THEN strftime(o_orderdate, '%m/%d/%Y')
                     ELSE strftime(o_orderdate, '%d.%m.%Y') END AS ds,
                CAST(COALESCE(
                  try_strptime(CASE WHEN o_orderkey % 3 = 0
                       THEN strftime(o_orderdate, '%Y-%m-%d')
                     WHEN o_orderkey % 3 = 1
                       THEN strftime(o_orderdate, '%m/%d/%Y')
                     ELSE strftime(o_orderdate, '%d.%m.%Y') END, '%Y-%m-%d'),
                  try_strptime(CASE WHEN o_orderkey % 3 = 0
                       THEN strftime(o_orderdate, '%Y-%m-%d')
                     WHEN o_orderkey % 3 = 1
                       THEN strftime(o_orderdate, '%m/%d/%Y')
                     ELSE strftime(o_orderdate, '%d.%m.%Y') END, '%m/%d/%Y'),
                  try_strptime(CASE WHEN o_orderkey % 3 = 0
                       THEN strftime(o_orderdate, '%Y-%m-%d')
                     WHEN o_orderkey % 3 = 1
                       THEN strftime(o_orderdate, '%m/%d/%Y')
                     ELSE strftime(o_orderdate, '%d.%m.%Y') END, '%d.%m.%Y'))
                  AS DATE) AS parsed
         FROM orders ORDER BY o_orderkey"""),

    Q("distinct_rows",
      (s, d) => lineitem(s, d).select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus"),
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus"""),

    // Nulls are injected via NULLIF (testdata has none — FIXTURES.md note 3)
    // then repaired with COALESCE / a fill default.
    Q("null_handling",
      (s, d) => orders(s, d).select(
        col("o_orderkey"),
        expr("nullif(o_orderstatus, 'P')").as("status_nullable"),
        expr("coalesce(nullif(o_orderstatus, 'P'), 'PENDING')")
          .as("status_filled"),
        expr("coalesce(nullif(o_custkey, 1), -1)").as("cust_masked"))
        .orderBy("o_orderkey"),
      """SELECT o_orderkey,
                NULLIF(o_orderstatus, 'P') AS status_nullable,
                COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_filled,
                COALESCE(NULLIF(o_custkey, 1), -1) AS cust_masked
         FROM orders ORDER BY o_orderkey"""),

    Q("case_when",
      (s, d) => lineitem(s, d).select(
        when(col("l_discount") < 0.03, "low")
          .when(col("l_discount") < 0.07, "mid")
          .otherwise("high").as("discount_band"))
        .groupBy("discount_band").agg(count(lit(1)).as("n"))
        .orderBy("discount_band"),
      """SELECT CASE WHEN l_discount < 0.03 THEN 'low'
                     WHEN l_discount < 0.07 THEN 'mid'
                     ELSE 'high' END AS discount_band,
                COUNT(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY discount_band"""),

    // The reference's `validate` verb as data (pair of `conform`): a
    // per-column conformance report against a declared metadata
    // document, over a dirty string ingest with planted defects — bad
    // keys (x-prefix every 11th), null prices (every 13th), impossible
    // months (k%15 ∈ {0,13,14}), null notes (every 7th), one declared-
    // but-absent column and one surplus column. ONE aggregate pass
    // computes every count (all conditionals fold into a single
    // 1-row partial agg — no per-column scans); the missing/surplus
    // rows are schema facts, not data. The oracle recomputes each count
    // from the construction rule.
    Q("conform_validate",
      (s, d) => {
        val dirty = dirtyOrdersBase(s, d).select(
          col("k_raw").as("k"),
          col("price_raw").as("price"),
          col("date_raw").as("event_date"),
          when(col("o_orderkey") % 7 === 0, lit(null: String))
            .otherwise(concat(lit("n"), col("o_orderkey"))).as("note"),
          lit("extra").as("extra_col"))
        val meta = TableMeta("orders_dirty", Seq(
          ColumnMeta("k", "long"),
          ColumnMeta("price", "double"),
          ColumnMeta("event_date", "date"),
          ColumnMeta("note", "character"),
          ColumnMeta("region", "character")))
        Conform.validateReport(dirty, meta)
          .orderBy("status", "col_name")
      },
      """WITH c AS (
           SELECT COUNT(*) FILTER (WHERE o_orderkey % 11 = 0) AS k_fail,
                  COUNT(*) FILTER (WHERE o_orderkey % 13 = 0) AS price_nulls,
                  COUNT(*) FILTER (WHERE o_orderkey % 15 IN (0, 13, 14))
                    AS date_fail,
                  COUNT(*) FILTER (WHERE o_orderkey % 7 = 0) AS note_nulls
           FROM orders)
         SELECT col_name, declared_type, status, n_nulls, n_cast_fail
         FROM (
           SELECT 'k' AS col_name, 'long' AS declared_type,
                  'ok' AS status, CAST(0 AS BIGINT) AS n_nulls,
                  k_fail AS n_cast_fail FROM c
           UNION ALL
           SELECT 'price', 'double', 'ok', price_nulls, 0 FROM c
           UNION ALL
           SELECT 'event_date', 'date', 'ok', 0, date_fail FROM c
           UNION ALL
           SELECT 'note', 'character', 'ok', note_nulls, 0 FROM c
           UNION ALL
           SELECT 'region', 'character', 'missing', NULL, NULL
           UNION ALL
           SELECT 'extra_col', NULL, 'surplus', NULL, NULL)
         ORDER BY status, col_name"""),
  )
}
