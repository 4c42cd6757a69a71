package graft.queries

import graft.Tables._
import graft.engine.udf.Udfs
import org.apache.spark.sql.functions._

/** UDF / UDAF / UDTF surface (SURVEY.md §2.9). These deliberately route
  * through the user-extension APIs (scalar udf, typed Aggregator via
  * functions.udaf, Dataset.flatMap generator) rather than builtins — the
  * point is proving the extension surface, with the oracle confirming
  * the builtin-equivalent semantics. */
object UdfQueries {

  val qs: Seq[Q] = Seq(
    Q("udf_scalar",
      (s, d) => {
        val band = udf(Udfs.discountBand)
        lineitem(s, d)
          .select(band(col("l_discount")).as("discount_band"))
          .groupBy("discount_band").agg(count(lit(1)).as("n"))
          .orderBy("discount_band")
      },
      """SELECT CASE WHEN l_discount < 0.03 THEN 'low'
                     WHEN l_discount < 0.07 THEN 'mid'
                     ELSE 'high' END AS discount_band, COUNT(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY discount_band"""),

    Q("udaf_aggregator",
      (s, d) => {
        val wavg = udaf(Udfs.WeightedAvgPrice)
        lineitem(s, d).groupBy("l_returnflag")
          .agg(wavg(col("l_extendedprice"), col("l_quantity"))
            .as("w_avg_price"))
          .orderBy("l_returnflag")
      },
      """SELECT l_returnflag,
                ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                               CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) /
                      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),
                      4) AS w_avg_price
         FROM lineitem GROUP BY 1 ORDER BY l_returnflag"""),

    // Imperative typed aggregate (SURVEY §2.9 udaf_imperative): the
    // graft_kmv TypedImperativeAggregate keeps the 32 smallest distinct
    // md5-derived hashes per group in one pass — a mergeable bottom-k
    // sketch whose k-th minimum (and hence the KMV distinct estimate
    // (k-1)·2^32/kth) is deterministic and SQL-checkable.
    Q("udaf_imperative",
      (s, d) => {
        graft.engine.expr.GraftFunctions.ensureRegistered(s)
        orders(s, d)
          .select(col("o_orderpriority"),
            conv(substring(md5(col("o_custkey").cast("string")), 1, 8),
              16, 10).cast("long").as("h"))
          .groupBy("o_orderpriority")
          .agg(expr("graft_kmv(h, 32)").as("kth_min_hash"))
          // a group with < 32 distinct hashes yields NULL (sketch not
          // full) while the oracle's WHERE rn = 32 emits no row — drop
          // under-filled groups identically on both sides
          .filter(col("kth_min_hash").isNotNull)
          .select(col("o_orderpriority"), col("kth_min_hash"),
            round(lit(31.0) * lit(4294967296.0) / col("kth_min_hash"), 2)
              .as("est_distinct"))
          .orderBy("o_orderpriority")
      },
      """SELECT o_orderpriority, h AS kth_min_hash,
                ROUND(31.0 * 4294967296.0 / h, 2) AS est_distinct
         FROM (
           SELECT o_orderpriority, h,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                    ORDER BY h) AS rn
           FROM (SELECT DISTINCT o_orderpriority,
                   CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)),
                     1, 8)) AS BIGINT) AS h
                 FROM orders))
         WHERE rn = 32
         ORDER BY o_orderpriority"""),

    // Generator: char-3-gram shingler as a typed flatMap (UDTF shape),
    // aggregated to distinct-shingle counts per document.
    Q("udtf_generator",
      (s, d) => {
        val spark = s
        import spark.implicits._
        documents(s, d).select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .flatMap { case (id, t) =>
            t.sliding(3).filter(_.length == 3).map(g => (id, g))
          }
          .toDF("doc_id", "shingle")
          .groupBy("doc_id")
          .agg(countDistinct(col("shingle")).as("n_shingles"))
          .orderBy("doc_id")
      },
      """SELECT doc_id, COUNT(DISTINCT sh) AS n_shingles FROM (
           SELECT doc_id, unnest(list_transform(range(1, length(text) - 1),
             i -> substring(text, i, 3))) AS sh
           FROM documents)
         GROUP BY doc_id ORDER BY doc_id"""),

    // SQL-DEFINED functions (Spark 4's CREATE FUNCTION ... RETURN —
    // the extension path that needs NO jar, no closure, no registry
    // code: the body is SQL, so Catalyst INLINES it into the plan and
    // whole-stage codegen sees straight expressions, unlike a black-box
    // scalar udf (udf_scalar) that breaks codegen at every call). Two
    // functions — a scalar margin and one composing the other — prove
    // nesting resolves; the oracle writes the bodies inline, which is
    // exactly what the optimizer reduces them to.
    Q("udf_sql",
      (s, d) => {
        lineitem(s, d).createOrReplaceTempView("graft_li_sqludf")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_margin(
                   price DOUBLE, disc DOUBLE, tax DOUBLE)
                 RETURNS DOUBLE
                 RETURN price * (1 - disc) * (1 + tax) - price""")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_margin_band(
                   price DOUBLE, disc DOUBLE, tax DOUBLE)
                 RETURNS STRING
                 RETURN CASE
                   WHEN graft_margin(price, disc, tax) < 0 THEN 'loss'
                   WHEN graft_margin(price, disc, tax) < 1000 THEN 'thin'
                   ELSE 'healthy' END""")
        // the margin total is declared in EXACT 1e-4 units: the old
        // CAST(margin AS DECIMAL(18,4)) hit the double→decimal cast
        // tie (Spark BigDecimal HALF_UP vs DuckDB float-based
        // rounding) on one sf0.1 row — floor(x·10⁴ + 0.5) of an
        // identical double is engine-exact, and the BIGINT sum needs
        // no rounding at all (the verify-skill lesson: stay integer
        // on the data path)
        s.sql("""SELECT graft_margin_band(l_extendedprice, l_discount,
                          l_tax) AS band,
                        COUNT(*) AS n,
                        SUM(CAST(floor(graft_margin(l_extendedprice,
                          l_discount, l_tax) * 10000 + 0.5) AS BIGINT))
                          AS margin_1e4
                 FROM graft_li_sqludf
                 GROUP BY 1 ORDER BY band""")
      },
      """SELECT CASE
                  WHEN l_extendedprice * (1 - l_discount) * (1 + l_tax)
                       - l_extendedprice < 0 THEN 'loss'
                  WHEN l_extendedprice * (1 - l_discount) * (1 + l_tax)
                       - l_extendedprice < 1000 THEN 'thin'
                  ELSE 'healthy' END AS band,
                COUNT(*) AS n,
                CAST(SUM(CAST(floor(
                  (l_extendedprice * (1 - l_discount) * (1 + l_tax)
                   - l_extendedprice) * 10000 + 0.5) AS BIGINT))
                  AS BIGINT) AS margin_1e4
         FROM lineitem GROUP BY 1 ORDER BY band"""),
  )
}
