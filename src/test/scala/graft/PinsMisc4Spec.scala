package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, miscellaneous part 4 — engagement
  * spectra and SAX run-length segments (see PinsAbSpec for the
  * discipline).
  */
class PinsMisc4Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("event_engagement_spectrum matches direct activity buckets") {
    val perUser = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getLong(1))
    def bucket(n: Long): String =
      if (n == 1) "1" else if (n <= 5) "2-5" else if (n <= 10) "6-10"
      else if (n <= 50) "11-50" else "50+"
    val byBucket = perUser.groupBy(bucket)
    val tu = perUser.length.toDouble
    val te = perUser.sum.toDouble
    val rows = q("event_engagement_spectrum").collect()
    assert(rows.length == byBucket.size)
    for (r <- rows) {
      val g = byBucket(r.getAs[String]("bucket"))
      assert(r.getAs[Long]("n_users") == g.length)
      assert(r.getAs[Long]("n_events") == g.sum)
      assert(math.abs(r.getAs[Double]("user_share_pct") -
        100.0 * g.length / tu) < 1e-2)
      assert(math.abs(r.getAs[Double]("event_share_pct") -
        100.0 * g.sum / te) < 1e-2)
    }
  }

  test("time_sax_runs matches a direct gaps-and-islands walk") {
    val daily = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toArray
      .map { case (d, xs) => (d, xs.map(_._2).sum / 100.0) }
      .sortBy(_._1.toEpochDay)
    val n = daily.length
    val mu = daily.map(_._2).sum / n
    val sd = math.sqrt(daily.map(x =>
      (x._2 - mu) * (x._2 - mu)).sum / n)
    val syms = daily.map { case (d, rev) =>
      val z = (rev - mu) / sd
      (d, if (z < -0.6745) "a" else if (z < 0) "b"
        else if (z < 0.6745) "c" else "d")
    }
    // collapse into runs
    val runs = scala.collection.mutable.ArrayBuffer
      .empty[(String, java.time.LocalDate, java.time.LocalDate, Int)]
    for ((d, s0) <- syms) {
      if (runs.nonEmpty && runs.last._1 == s0) {
        val last = runs.remove(runs.length - 1)
        runs += ((s0, last._2, d, last._4 + 1))
      } else runs += ((s0, d, d, 1))
    }
    val rows = q("time_sax_runs").collect()
    assert(rows.length == runs.length)
    rows.zip(runs).zipWithIndex.foreach {
      case ((r, (s0, start, end, len)), i) =>
        assert(r.getAs[Long]("run_id") == i + 1)
        assert(r.getAs[String]("sax_symbol") == s0)
        assert(r.getAs[String]("run_start") == start.toString)
        assert(r.getAs[String]("run_end") == end.toString)
        assert(r.getAs[Long]("run_days") == len)
    }
  }
}
