package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, miscellaneous aggregate /
  * downsampling / privacy keys (see PinsAbSpec for the discipline).
  */
class PinsMiscSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("agg_winsorize matches a direct 1st/99th percentile clamp") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val rows = q("agg_winsorize").collect()
    val byFlag = li.groupBy(_._1)
    for (r <- rows) {
      val ps = byFlag(r.getAs[String]("flag")).map(_._2).sorted
      val n = ps.length
      val lo = ps((n + 99) / 100 - 1)
      val hi = ps((n * 99 + 99) / 100 - 1)
      val clamped = ps.map(p => math.min(math.max(p, lo), hi))
      assert(r.getAs[Long]("n_rows") == n)
      assert(math.abs(r.getAs[Double]("min_w") - lo) < 1e-9)
      assert(math.abs(r.getAs[Double]("max_w") - hi) < 1e-9)
      assert(math.abs(r.getAs[Double]("sum_winsorized") - clamped.sum)
        < clamped.sum.abs * 1e-9 + 0.02)
    }
  }

  test("time_m4_downsample matches direct per-bucket M4 corners") {
    val ev = Tables.events(spark, sf)
      .select(unix_micros(col("ts")), col("value"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byBucket = ev.groupBy(_._1 / 3600000000L)
    val rows = q("time_m4_downsample").collect()
    assert(rows.length == byBucket.size)
    for (r <- rows) {
      val g = byBucket(r.getAs[Long]("bucket"))
      val first = g.minBy(x => (x._1, x._3))
      val last = g.maxBy(x => (x._1, x._3))
      assert(r.getAs[Long]("n_points") == g.length)
      assert(r.getAs[Long]("t_first") == first._1)
      assert(r.getAs[Double]("v_first") == first._2)
      assert(r.getAs[Long]("t_last") == last._1)
      assert(r.getAs[Double]("v_last") == last._2)
      assert(r.getAs[Double]("v_min") == g.map(_._2).min)
      assert(r.getAs[Double]("v_max") == g.map(_._2).max)
    }
  }

  test("dq_kanonymity matches direct equivalence-class counts") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val classes = cust.groupBy(identity).view.mapValues(_.length).toMap
    val rows = q("dq_kanonymity").collect()
    assert(rows.length == classes.size)
    for (r <- rows) {
      val key = (r.getAs[Long]("nation"), r.getAs[String]("segment"))
      assert(r.getAs[Long]("n") == classes(key))
      assert(r.getAs[Boolean]("at_risk") == (classes(key) < 5))
    }
  }

  test("time_decay_sum matches a direct half-life fixed-point fold") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val rows = q("time_decay_sum").collect()
    val byUser = ev.groupBy(_._1)
    assert(rows.length == byUser.size)
    for (r <- rows.take(150)) {
      val g = byUser(r.getAs[Long]("user_id"))
      val tLast = g.map(_._2).max
      val sum = g.map { case (_, t, v) =>
        val k = math.floor((tLast - t).toDouble / 86400000000L).toInt
        val iv = BigDecimal(v).setScale(4, BigDecimal.RoundingMode
          .HALF_UP).*(10000).toLongExact
        if (k >= 63) 0L
        else if (iv < 0) -(math.abs(iv) / (1L << math.min(k, 62)))
        else iv / (1L << math.min(k, 62))
      }.sum
      assert(r.getAs[Long]("n_events") == g.length)
      assert(math.abs(r.getAs[Double]("decayed_value") - sum / 10000.0)
        < 1e-3)
    }
  }

  test("time_top_movers matches direct per-priority DoD deltas") {
    val daily = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(x => (x._1, x._2)).view.mapValues(_.map(_._3).sum).toMap
    // per priority: day-over-day (consecutive observations) deltas
    val deltas = daily.keys.groupBy(_._1).toSeq.flatMap {
      case (prio, keys) =>
        val days = keys.map(_._2).toSeq.sortBy(_.toEpochDay)
        days.zip(days.tail).map { case (d0, d1) =>
          (prio, d1, daily((prio, d1)) - daily((prio, d0)))
        }
    }
    val top = deltas.sortBy { case (p, d, dl) =>
      (-math.abs(dl), p, d.toEpochDay) }.take(20)
    val rows = q("time_top_movers").collect()
    assert(rows.length == top.length)
    // compare as sets of (priority, day, delta) — the operator's
    // exact tie-break order is its own contract; the MEMBERS must
    // match the brute-force top-20 by |delta|
    val got = rows.map(r => (r.getString(0), r.getDate(1).toLocalDate,
      math.round(r.getAs[Double]("delta") * 100))).toSet
    assert(got == top.map(t => (t._1, t._2, t._3)).toSet)
  }
}
