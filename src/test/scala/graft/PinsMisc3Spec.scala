package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, miscellaneous part 3 — 2-D
  * histograms, rollup shares and multi-horizon backtests (see
  * PinsAbSpec for the discipline).
  */
class PinsMisc3Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("agg_histogram2d matches direct (band, month) cell shares") {
    val cells = Tables.orders(spark, sf)
      .select(col("o_totalprice"), col("o_orderdate").cast("date"))
      .collect()
      .map(r => (math.min(math.floor(r.getDouble(0) / 60000.0), 9.0)
        .toInt, r.getDate(1).toLocalDate.getMonthValue.toLong))
      .groupBy(identity).view.mapValues(_.length).toMap
    val total = cells.values.sum.toDouble
    val rows = q("agg_histogram2d").collect()
    assert(rows.length == cells.size)
    for (r <- rows) {
      val key = (r.getAs[Int]("price_band"), r.getAs[Long]("m"))
      assert(r.getAs[Long]("cnt") == cells(key))
      assert(math.abs(r.getAs[Double]("share_pct") -
        100.0 * cells(key) / total) < 1e-2)
    }
  }

  test("agg_rollup_share matches direct region/nation shares") {
    val geo = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"), col("n_name"))
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2)))).toMap
    val leaf = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (ck, c) => geo.get(ck).map(g => (g, c)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byRegion = leaf.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val total = leaf.values.sum.toDouble
    val rows = q("agg_rollup_share").collect()
    assert(rows.length == leaf.size)
    for (r <- rows) {
      val key = (r.getAs[String]("region"), r.getAs[String]("nation"))
      val cents = leaf(key)
      assert(math.abs(r.getAs[Double]("revenue") - cents / 100.0)
        < 1e-6)
      assert(math.abs(r.getAs[Double]("pct_of_region") -
        100.0 * cents / byRegion(key._1)) < 1e-2)
      assert(math.abs(r.getAs[Double]("region_pct_of_total") -
        100.0 * byRegion(key._1) / total) < 1e-2)
    }
  }

  test("time_backtest_horizons matches direct lag-1/3/7 MAEs") {
    val daily = Tables.events(spark, sf)
      .select(col("ts").cast("date"),
        expr("CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toArray
      .map { case (d, xs) => (d, xs.map(_._2).sum) }
      .sortBy(_._1.toEpochDay).map(_._2)
    def mae(h: Int): Double = {
      val errs = (h until daily.length).map(t =>
        math.abs(daily(t) - daily(t - h)))
      errs.sum.toDouble / errs.length / 100.0
    }
    val row = q("time_backtest_horizons").head()
    assert(row.getAs[Long]("n_days") == daily.length)
    assert(math.abs(row.getAs[Double]("mae_h1") - mae(1)) < 1e-2)
    assert(math.abs(row.getAs[Double]("mae_h3") - mae(3)) < 1e-2)
    assert(math.abs(row.getAs[Double]("mae_h7") - mae(7)) < 1e-2)
  }
}
