package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, event-behavior part 2 (see
  * PinsAbSpec for the discipline).
  */
class PinsEvent2Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ev: Array[(Long, Long, String, Long,
      java.time.LocalDate)] =
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("ts").cast("date"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getDate(4).toLocalDate))

  test("event_audience_overlap matches direct Jaccard over user sets") {
    val sets = ev.map(x => (x._3, x._2)).distinct.groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val rows = q("event_audience_overlap").collect()
    val expected = for {
      i <- types.indices; j <- (i + 1) until types.length
      both = sets(types(i)).intersect(sets(types(j))).size
      if both > 0
    } yield (types(i), types(j), both)
    assert(rows.length == expected.length)
    for (r <- rows) {
      val a = r.getAs[String]("type_a"); val b = r.getAs[String]("type_b")
      val both = sets(a).intersect(sets(b)).size
      assert(r.getAs[Long]("n_both") == both)
      assert(math.abs(r.getAs[Double]("jaccard") -
        both.toDouble / sets(a).union(sets(b)).size) < 1e-3)
    }
  }

  test("event_repurchase_cycle matches direct gap quantiles") {
    val gaps = ev.filter(_._3 == "purchase").groupBy(_._2).toSeq
      .flatMap { case (_, xs) =>
        val ts = xs.map(_._4 / 1000000L).sorted
        if (ts.length < 2) None
        else {
          val gs = ts.zip(ts.tail).map { case (a, b) => b - a }
          Some(gs.sum.toDouble / gs.length)
        }
      }
    def qcont(xs: Seq[Double], p: Double): Double = {
      val s = xs.sorted
      val h = (s.length - 1) * p
      s(h.toInt) + (h - h.toInt) *
        (s(math.min(h.toInt + 1, s.length - 1)) - s(h.toInt))
    }
    val row = q("event_repurchase_cycle").head()
    assert(row.getAs[Long]("n_repeat_buyers") == gaps.length)
    assert(math.abs(row.getAs[Double]("median_s") - qcont(gaps, 0.5))
      < 1.0)
    assert(math.abs(row.getAs[Double]("p25_s") - qcont(gaps, 0.25))
      < 1.0)
    assert(math.abs(row.getAs[Double]("p75_s") - qcont(gaps, 0.75))
      < 1.0)
  }

  test("event_abandoned_clicks matches a direct no-purchase screen") {
    val purch = ev.filter(_._3 == "purchase").groupBy(_._2)
      .view.mapValues(_.map(_._4)).toMap
    val clicks = ev.filter(_._3 == "click")
    val byDay = clicks.groupBy(_._5)
    val rows = q("event_abandoned_clicks").collect()
    assert(rows.length == byDay.size)
    for (r <- rows) {
      val g = byDay(r.getDate(0).toLocalDate)
      val abandoned = g.count { c =>
        !purch.getOrElse(c._2, Array.empty[Long]).exists(p =>
          p > c._4 && p <= c._4 + 3600000000L)
      }
      assert(r.getAs[Long]("n_clicks") == g.length)
      assert(r.getAs[Long]("n_abandoned") == abandoned)
      assert(math.abs(r.getAs[Double]("abandon_rate") -
        abandoned.toDouble / g.length) < 1e-3)
    }
  }

  test("pareto_gini_banded matches a direct banded Lorenz trapezoid") {
    val spend = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sum).toSeq
    val bands = spend.groupBy(c =>
      63 - java.lang.Long.numberOfLeadingZeros(math.max(c, 1)))
      .toSeq.sortBy(_._1)
    val tn = spend.size.toDouble
    val tc = spend.sum.toDouble
    var cumN = 0L; var cumC = 0L
    var prevX = 0.0; var prevY = 0.0; var gini = 0.0
    for ((_, g) <- bands) {
      cumN += g.size; cumC += g.sum
      val x = cumN / tn; val y = cumC / tc
      gini += (x - prevX) * (y + prevY)
      prevX = x; prevY = y
    }
    gini = 1.0 - gini
    val rows = q("pareto_gini_banded").collect()
    assert(rows.nonEmpty)
    // every row carries the whole-curve gini; spot-check it and the
    // cumulative coordinates of the last band
    val giniCol = rows.map(_.getAs[Double]("gini_banded")).distinct
    assert(giniCol.length == 1)
    assert(math.abs(giniCol.head - gini) < 1e-3)
  }
}
