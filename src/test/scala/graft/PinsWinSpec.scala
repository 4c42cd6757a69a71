package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, window-statistics family (see
  * PinsAbSpec for the discipline). Frames are rebuilt as explicit
  * array slices over per-user ordered streams.
  */
class PinsWinSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ev: Array[(Long, Long, String, Long, Double)] =
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))

  test("win_zscore matches direct per-type standardization") {
    val byType = ev.groupBy(_._3).view.mapValues { xs =>
      val n = xs.length
      val mu = xs.map(_._5).sum / n
      val sd = math.sqrt(xs.map(x =>
        (x._5 - mu) * (x._5 - mu)).sum / (n - 1))
      (mu, sd)
    }.toMap
    val rows = q("win_zscore").collect()
    assert(rows.length == ev.length)
    val byId = ev.map(x => x._1 -> x).toMap
    for (r <- rows.take(200)) {
      val x = byId(r.getAs[Long]("event_id"))
      val (mu, sd) = byType(x._3)
      assert(math.abs(r.getAs[Double]("zscore") - (x._5 - mu) / sd)
        < 1e-3)
    }
  }

  test("win_rolling_stats matches explicit 7-row frame moments") {
    val rows = q("win_rolling_stats").collect()
    val frames = ev.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._4, x._1))
      s.indices.map { i =>
        val win = s.slice(math.max(0, i - 6), i + 1).map(x =>
          BigDecimal(x._5).setScale(4, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
        (s(i)._1, win)
      }
    }.toMap
    assert(rows.length == ev.length)
    for (r <- rows.take(200)) {
      val win = frames(r.getAs[Long]("event_id"))
      val n = win.length
      val mean = win.sum / n
      assert(r.getAs[Long]("roll_n") == n)
      assert(math.abs(r.getAs[Double]("roll_mean") - mean) < 1e-3)
      if (n > 1) {
        val sd = math.sqrt(math.max(0.0,
          win.map(v => (v - mean) * (v - mean)).sum / (n - 1)))
        assert(math.abs(r.getAs[Double]("roll_std") - sd) < 1e-3)
      } else assert(r.isNullAt(r.fieldIndex("roll_std")))
    }
  }

  test("win_rolling_median matches explicit 7-row frame medians") {
    val rows = q("win_rolling_median").collect()
    val frames = ev.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._4, x._1))
      s.indices.map { i =>
        (s(i)._1, s.slice(math.max(0, i - 6), i + 1).map(_._5).sorted)
      }
    }.toMap
    for (r <- rows.take(200)) {
      val win = frames(r.getAs[Long]("event_id"))
      val n = win.length
      // linear-interpolated median (percentile/quantile_cont)
      val med = if (n % 2 == 1) win(n / 2)
        else (win(n / 2 - 1) + win(n / 2)) / 2.0
      assert(math.abs(r.getAs[Double]("med7") - med) < 1e-3)
    }
  }

  test("win_distribution matches direct percent_rank and cume_dist") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal").cast("double"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val rows = q("win_distribution").collect()
    val bySeg = cust.groupBy(_._2)
    val byId = cust.map(x => x._1 -> x).toMap
    for (r <- rows) {
      val x = byId(r.getAs[Long]("c_custkey"))
      val seg = bySeg(x._2)
      val n = seg.length
      val below = seg.count(_._3 < x._3)
      val atOrBelow = seg.count(_._3 <= x._3)
      val pr = if (n == 1) 0.0 else below.toDouble / (n - 1)
      assert(math.abs(r.getAs[Double]("pct_rank") - pr) < 1e-3)
      assert(math.abs(r.getAs[Double]("cume") -
        atOrBelow.toDouble / n) < 1e-3)
    }
  }

  test("win_share_of_group matches direct lifetime-spend shares") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totByCust = o.groupBy(_._2).view.mapValues(_.map(_._3).sum)
      .toMap
    val rows = q("win_share_of_group").collect()
    assert(rows.length == o.length)
    val byKey = o.map(x => x._1 -> x).toMap
    for (r <- rows.take(200)) {
      val x = byKey(r.getAs[Long]("o_orderkey"))
      assert(math.abs(r.getAs[Double]("price") - x._3 / 100.0) < 1e-6)
      assert(math.abs(r.getAs[Double]("share_of_customer_pct") -
        100.0 * x._3 / totByCust(x._2)) < 1e-2)
    }
  }
}
