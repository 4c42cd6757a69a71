package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, profiling part 2 (see PinsAbSpec
  * for the discipline).
  */
class PinsProfile2Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ord: Array[(Long, Double, String, String)] =
    Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        r.getString(3)))

  test("profile_histogram matches direct fixed-width bucket counts") {
    val hist = ord.groupBy(x =>
      (math.floor(x._2 / 50000) * 50000).toLong)
      .view.mapValues(_.length).toMap
    val rows = q("profile_histogram").collect()
    assert(rows.length == hist.size)
    for (r <- rows)
      assert(r.getAs[Long]("n") == hist(r.getAs[Long]("bucket_lo")))
  }

  test("profile_summary matches direct describe stats per column") {
    val rows = q("profile_summary").collect()
    assert(rows.length == 3)
    val colsOf: Map[String, Array[String]] = Map(
      "o_custkey" -> ord.map(_._1.toString),
      "o_orderstatus" -> ord.map(_._3),
      "o_orderpriority" -> ord.map(_._4))
    for (r <- rows) {
      val vals = colsOf(r.getAs[String]("col_name"))
      assert(r.getAs[Long]("n_rows") == ord.length)
      assert(r.getAs[Long]("n_null") == 0)
      assert(r.getAs[Long]("n_distinct") == vals.distinct.length)
      assert(r.getAs[String]("min_str") == vals.min)
      assert(r.getAs[String]("max_str") == vals.max)
    }
  }

  test("profile_doc_length_hist matches direct log2 length bands") {
    val docs = Tables.documents(spark, sf).select(col("n_chars"))
      .collect().map(_.getLong(0))
    val bandOf = (n: Long) =>
      63 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1))
    val bands = docs.groupBy(bandOf)
    val rows = q("profile_doc_length_hist").collect()
    assert(rows.length == bands.size)
    for (r <- rows) {
      val g = bands(r.getAs[Int]("log2_band"))
      assert(r.getAs[Long]("n_docs") == g.length)
      assert(r.getAs[Long]("min_chars") == g.min)
      assert(r.getAs[Long]("max_chars") == g.max)
      assert(math.abs(r.getAs[Double]("share_pct") -
        100.0 * g.length / docs.length) < 1e-2)
    }
  }
}
