package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, time-series part 6 — scorecards,
  * calendar spines and interpolation (see PinsAbSpec for the
  * discipline).
  */
class PinsTime6Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("time_period_over_period matches direct MoM/YoY ratios") {
    val monthly = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(x => x._1.getYear * 12 + x._1.getMonthValue - 1)
      .view.mapValues(_.map(_._2).sum).toMap
    val mis = monthly.keys.toSeq.sorted
    val rows = q("time_period_over_period").collect()
    assert(rows.length == mis.length)
    rows.zip(mis).foreach { case (r, mi) =>
      assert(r.getAs[String]("month") ==
        f"${mi / 12}%d-${mi % 12 + 1}%02d")
      assert(math.abs(r.getAs[Double]("revenue") -
        monthly(mi) / 100.0) < 1e-2)
      // lag-k over the OBSERVED month sequence (positional, not
      // calendar): the k-th previous month index in sorted order
      val pos = mis.indexOf(mi)
      def check(colName: String, k: Int): Unit = {
        if (pos >= k) {
          val prev = monthly(mis(pos - k))
          val pct = (monthly(mi) - prev).toDouble / prev * 100.0
          assert(math.abs(r.getAs[Double](colName) - pct) < 1e-2,
            s"$colName at $mi")
        } else assert(r.isNullAt(r.fieldIndex(colName)))
      }
      check("mom_pct", 1)
      check("yoy_pct", 12)
    }
  }

  test("time_resample matches a direct 1995 calendar spine") {
    val daily = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date"), col("o_totalprice"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getDouble(1)))
      .filter(x => x._1.getYear == 1995)
      .groupBy(_._1).view.mapValues { xs =>
        (xs.length, xs.map(x => BigDecimal(x._2)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
      }.toMap
    val rows = q("time_resample").collect()
    assert(rows.length == 365)
    for (r <- rows) {
      val day = r.getDate(0).toLocalDate
      daily.get(day) match {
        case Some((n, rev)) =>
          assert(r.getAs[Long]("n_orders") == n)
          assert(math.abs(r.getAs[Double]("revenue") - rev) < 1e-6)
        case None =>
          assert(r.getAs[Long]("n_orders") == 0L)
          assert(r.getAs[Double]("revenue") == 0.0)
      }
    }
  }

  test("time_gap_fill matches direct linear interpolation at grid") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val rows = q("time_gap_fill").collect()
    val byUser = ev.groupBy(_._1)
    for (r <- rows.take(200)) {
      val u = r.getAs[Long]("user_id")
      val t = r.getAs[Long]("t_us")
      val s = byUser(u).sortBy(_._2)
      val prev = s.filter(_._2 <= t).lastOption
      val next = s.filter(_._2 >= t).headOption
      (prev, next) match {
        case (Some(p), Some(n)) =>
          val interp = if (n._2 == p._2) p._3
            else p._3 + (n._3 - p._3) *
              (t - p._2).toDouble / (n._2 - p._2)
          assert(math.abs(r.getAs[Double]("v_interp") - interp) < 1e-3,
            s"user $u t $t")
        case _ => fail(s"grid point outside event span: $u $t")
      }
    }
  }
}
