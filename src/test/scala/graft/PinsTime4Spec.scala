package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, time-series family part 4 (see
  * PinsAbSpec for the discipline).
  */
class PinsTime4Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("time_yoy_growth matches direct same-month-last-year ratios") {
    val m = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(x => (x._1.getYear, x._1.getMonthValue))
      .view.mapValues(_.map(_._2).sum).toMap
    val rows = q("time_yoy_growth").collect()
    assert(rows.length == m.size)
    for (r <- rows) {
      val y = r.getAs[Int]("y"); val mo = r.getAs[Int]("m")
      val cents = m((y, mo))
      assert(math.abs(r.getAs[Double]("revenue") - cents / 100.0)
        < 1e-6)
      m.get((y - 1, mo)) match {
        case Some(prev) =>
          val g = (cents - prev).toDouble / prev
          assert(math.abs(r.getAs[Double]("yoy_growth") - g) < 1e-3,
            s"$y-$mo")
        case None =>
          assert(r.isNullAt(r.fieldIndex("yoy_growth")))
      }
    }
  }

  test("time_ewma matches a direct half-life weighted mean per user") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("value"), unix_micros(col("ts")),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3)))
    val rows = q("time_ewma").collect()
    val byUser = ev.groupBy(_._1)
    assert(rows.length == byUser.size)
    for (r <- rows.take(100)) {
      val xs = byUser(r.getAs[Long]("user_id"))
        .sortBy(x => (x._3, x._4)).map(_._2)
      val n = xs.length
      val ws = xs.indices.map(i => math.pow(0.5, n - 1 - i))
      val ewma = xs.zip(ws).map { case (v, w) => v * w }.sum / ws.sum
      assert(r.getAs[Long]("n_events") == n)
      assert(math.abs(r.getAs[Double]("ewma") - ewma) < 1e-3)
    }
  }

  test("time_seasonality matches direct (dow, hour) load shares") {
    val cells = Tables.events(spark, sf)
      .select(expr("weekday(ts) + 1"), hour(col("ts")))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val total = cells.length.toDouble
    val hist = cells.groupBy(identity).view.mapValues(_.length).toMap
    val rows = q("time_seasonality").collect()
    assert(rows.length == hist.size)
    for (r <- rows) {
      val key = (r.getAs[Int]("dow"), r.getAs[Int]("hr"))
      assert(r.getAs[Long]("n") == hist(key))
      assert(math.abs(r.getAs[Double]("share") - hist(key) / total)
        < 1e-3)
    }
  }

  test("time_seasonal_strength matches a direct dow-ANOVA R-squared") {
    val daily = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toArray
      .map { case (d, xs) => (d.getDayOfWeek.getValue, xs.map(_._2).sum
        .toDouble) }
    val n = daily.length
    val grand = daily.map(_._2).sum / n
    val sst = daily.map(x => (x._2 - grand) * (x._2 - grand)).sum
    val ssr = daily.groupBy(_._1).values.map { g =>
      val m = g.map(_._2).sum / g.length
      g.map(x => (x._2 - m) * (x._2 - m)).sum }.sum
    val row = q("time_seasonal_strength").head()
    assert(row.getAs[Long]("n_days") == n)
    assert(math.abs(row.getAs[Double]("seasonal_strength") -
      (1.0 - ssr / sst)) < 1e-3)
  }
}
