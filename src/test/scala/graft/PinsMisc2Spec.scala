package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, miscellaneous part 2 — modes,
  * percentiles, dwell/new-user event shares, vector norms and word
  * counts (see PinsAbSpec for the discipline).
  */
class PinsMisc2Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("agg_mode matches direct per-status modal priorities") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val rows = q("agg_mode").collect()
    val byStatus = o.groupBy(_._1)
    assert(rows.length == byStatus.size)
    for (r <- rows) {
      val g = byStatus(r.getAs[String]("o_orderstatus"))
      val (mode, cnt) = g.groupBy(_._2).view.mapValues(_.length)
        .toSeq.minBy { case (p, c) => (-c, p) }
      assert(r.getAs[String]("mode_priority") == mode)
      assert(r.getAs[Long]("mode_count") == cnt)
    }
  }

  test("agg_percentile matches interpolated quantiles") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    def qcont(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * p
      val lo = s(h.toInt)
      val hi = s(math.min(h.toInt + 1, s.length - 1))
      lo + (h - h.toInt) * (hi - lo)
    }
    val byStatus = o.groupBy(_._1)
    for (r <- q("agg_percentile").collect()) {
      val xs = byStatus(r.getAs[String]("o_orderstatus")).map(_._2)
        .toSeq
      assert(math.abs(r.getAs[Double]("p50") - qcont(xs, 0.5)) < 1e-2)
      assert(math.abs(r.getAs[Double]("p90") - qcont(xs, 0.9)) < 1e-2)
    }
    for (r <- q("agg_percentile_disc").collect()) {
      val xs = byStatus(r.getAs[String]("o_orderstatus")).map(_._2)
        .toSeq.sorted
      // percentile_disc(0.5): smallest value with cume_dist >= 0.5
      val disc = xs(math.ceil(xs.length * 0.5).toInt - 1)
      assert(math.abs(r.getAs[Double]("p50_disc") - disc) < 1e-2)
      assert(math.abs(r.getAs[Double]("p50_cont") - qcont(xs, 0.5))
        < 1e-2)
    }
  }

  test("event_dwell_time matches direct inter-event gaps by type") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val dwells = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._3, x._4))
      s.zip(s.tail).map { case (a, b) => (a._2, b._3 - a._3) }
    }
    val total = dwells.map(_._2).sum
    val rows = q("event_dwell_time").collect()
    val byType = dwells.groupBy(_._1)
    assert(rows.length == byType.size)
    for (r <- rows) {
      val g = byType(r.getAs[String]("event_type")).map(_._2)
      assert(r.getAs[Long]("n_dwells") == g.length)
      assert(math.abs(r.getAs[Long]("mean_ms") -
        g.sum.toDouble / 1000 / g.length) < 1.0)
      assert(r.getAs[Long]("max_us") == g.max)
      assert(r.getAs[Long]("min_us") == g.min)
      assert(math.abs(r.getAs[Double]("share_of_total") -
        g.sum.toDouble / total) < 1e-3)
    }
  }

  test("event_newuser_share matches direct first-24h shares") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")),
        col("ts").cast("date"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val t0 = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val byDay = ev.groupBy(_._3)
    val rows = q("event_newuser_share").collect()
    assert(rows.length == byDay.size)
    for (r <- rows) {
      val g = byDay(r.getDate(0).toLocalDate)
      val nNew = g.count(x => x._2 - t0(x._1) < 86400000000L)
      assert(r.getAs[Long]("n_events") == g.length)
      assert(r.getAs[Long]("n_new_user_events") == nNew)
      assert(math.abs(r.getAs[Double]("new_share_pct") -
        100.0 * nNew / g.length) < 1e-2)
    }
  }

  test("vec_norm_stats matches direct L2 norms per label") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("label").cast("string"), col("embedding"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Float](1).toArray))
    val rows = q("vec_norm_stats").collect()
    val byLabel = emb.groupBy(_._1)
    assert(rows.length == byLabel.size)
    for (r <- rows) {
      val g = byLabel(String.valueOf(r.get(r.fieldIndex("label"))))
      val norms = g.map(x =>
        math.sqrt(x._2.map(v => v.toDouble * v).sum))
      assert(r.getAs[Long]("n_vectors") == g.length)
      assert(r.getAs[Int]("dim") == g.head._2.length)
      assert(math.abs(r.getAs[Double]("avg_norm") -
        norms.sum / norms.length) < 1e-3)
      assert(math.abs(r.getAs[Double]("min_norm") - norms.min) < 1e-3)
      assert(math.abs(r.getAs[Double]("max_norm") - norms.max) < 1e-3)
    }
  }

  test("text_wordcount matches a direct lowercase histogram top-50") {
    val words = Tables.documents(spark, sf).select(col("text"))
      .collect().flatMap(_.getString(0).toLowerCase.split(" ", -1))
    val top = words.groupBy(identity).view.mapValues(_.length)
      .toSeq.sortBy { case (w, c) => (-c, w) }.take(50)
    val rows = q("text_wordcount").collect()
    assert(rows.map(r => (r.getAs[String]("word"),
      r.getAs[Long]("cnt"))).toSeq ==
      top.map { case (w, c) => (w, c.toLong) })
  }
}
