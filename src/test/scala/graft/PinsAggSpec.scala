package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, aggregate-statistics family (see
  * PinsAbSpec for the discipline).
  */
class PinsAggSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (flag, quantity, extendedprice, orderkey) lineitem rows. */
  private lazy val li: Array[(String, Double, Double, Long)] =
    Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"), col("l_orderkey"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3)))

  /** custkey -> exact order-spend cents. */
  private lazy val spend: Map[Long, Long] =
    Tables.orders(spark, sf)
      .select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  test("agg_corr matches direct Pearson and sample covariance") {
    val rows = q("agg_corr").collect()
    val byFlag = li.groupBy(_._1)
    assert(rows.length == byFlag.size)
    for (r <- rows) {
      val g = byFlag(r.getAs[String]("l_returnflag"))
      val n = g.length
      val mx = g.map(_._2).sum / n; val my = g.map(_._3).sum / n
      val cov = g.map(x => (x._2 - mx) * (x._3 - my)).sum / (n - 1)
      val rho = g.map(x => (x._2 - mx) * (x._3 - my)).sum /
        math.sqrt(g.map(x => (x._2 - mx) * (x._2 - mx)).sum *
          g.map(x => (x._3 - my) * (x._3 - my)).sum)
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("corr_qty_price") - rho) < 1e-3)
      assert(math.abs(r.getAs[Double]("covar_qty_price") - cov) <
        math.abs(cov) * 1e-6 + 1e-2)
    }
  }

  test("agg_regression matches a direct least-squares line") {
    val rows = q("agg_regression").collect()
    val byFlag = li.groupBy(_._1)
    for (r <- rows) {
      val g = byFlag(r.getAs[String]("l_returnflag"))
      val n = g.length
      val mx = g.map(_._2).sum / n; val my = g.map(_._3).sum / n
      val slope = g.map(x => (x._2 - mx) * (x._3 - my)).sum /
        g.map(x => (x._2 - mx) * (x._2 - mx)).sum
      val icpt = my - slope * mx
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-3)
      assert(math.abs(r.getAs[Double]("intercept") - icpt) < 1e-2)
    }
  }

  test("agg_kurtosis matches direct central moments") {
    val rows = q("agg_kurtosis").collect()
    val byFlag = li.groupBy(_._1)
    for (r <- rows) {
      val g = byFlag(r.getAs[String]("l_returnflag"))
        .map(_._2.toLong.toDouble)
      val n = g.length
      val mu = g.sum / n
      val m2 = g.map(x => math.pow(x - mu, 2)).sum / n
      val m3 = g.map(x => math.pow(x - mu, 3)).sum / n
      val m4 = g.map(x => math.pow(x - mu, 4)).sum / n
      assert(math.abs(r.getAs[Double]("mean_q") - mu) < 1e-3)
      assert(math.abs(r.getAs[Double]("skewness") -
        m3 / (m2 * math.sqrt(m2))) < 1e-3)
      assert(math.abs(r.getAs[Double]("kurtosis_excess") -
        (m4 / (m2 * m2) - 3)) < 1e-3)
    }
  }

  test("agg_trimmed_mean matches a direct 10 percent trim") {
    val rows = q("agg_trimmed_mean").collect()
    val byFlag = li.groupBy(_._1)
    for (r <- rows) {
      val g = byFlag(r.getAs[String]("flag"))
        .sortBy(x => (x._3, x._4))
      val n = g.length
      val kept = g.slice(n / 10, n - n / 10)
      val mean = kept.map(_._3).sum / kept.length
      assert(r.getAs[Long]("n_kept") == kept.length)
      assert(math.abs(r.getAs[Double]("trimmed_mean") - mean) < 1e-2)
    }
  }

  test("agg_theil_index matches the direct Theil T per region") {
    val geo = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val byRegion = spend.toSeq.flatMap { case (ck, x) =>
      geo.get(ck).map(rg => (rg, x)) }.groupBy(_._1)
    val rows = q("agg_theil_index").collect()
    assert(rows.length == byRegion.size)
    for (r <- rows) {
      val xs = byRegion(r.getAs[String]("region")).map(_._2.toDouble)
      val n = xs.length
      val mu = xs.sum / n
      val t = xs.map { x => (x / mu) * math.log(x / mu) }.sum / n
      assert(r.getAs[Long]("n_customers") == n)
      assert(math.abs(r.getAs[Double]("theil_t") - t) < 1e-3)
      assert(math.abs(r.getAs[Double]("theil_max") - math.log(n))
        < 1e-3)
    }
  }

  test("agg_weighted_median matches a direct weighted selection") {
    val rows = q("agg_weighted_median").collect()
    val byFlag = li.groupBy(_._1)
    for (r <- rows) {
      val g = byFlag(r.getAs[String]("flag"))
      val byPrice = g.groupBy(x => math.round(x._3 * 100))
        .view.mapValues(_.map(_._2.toLong).sum).toSeq.sortBy(_._1)
      val total = byPrice.map(_._2).sum
      var cum = 0L
      val med = byPrice.find { case (_, w) =>
        cum += w; cum * 2 >= total }.get._1
      assert(r.getAs[Long]("total_units") == total)
      assert(math.abs(r.getAs[Double]("weighted_median_price") -
        med / 100.0) < 1e-9)
    }
  }

  test("agg_hhi matches direct share-squared concentration") {
    val seg = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val bySeg = spend.toSeq.flatMap { case (ck, x) =>
      seg.get(ck).map(sg => (sg, x)) }.groupBy(_._1)
    val rows = q("agg_hhi").collect()
    assert(rows.length == bySeg.size)
    for (r <- rows) {
      val xs = bySeg(r.getAs[String]("segment")).map(_._2.toDouble)
      val tot = xs.sum
      val hhi = xs.map(x => (x / tot) * (x / tot)).sum
      assert(r.getAs[Long]("n_customers") == xs.length)
      assert(math.abs(r.getAs[Double]("hhi") - hhi) < 1e-4)
      assert(math.abs(r.getAs[Double]("effective_n") - 1.0 / hhi)
        < 1e-1)
    }
  }

  test("agg_atkinson matches direct geometric-mean inequality") {
    val xs = spend.values.filter(_ > 0).map(_.toDouble).toSeq
    val n = xs.size
    val geo = math.exp(xs.map(math.log).sum / n)
    val mean = xs.sum / n
    val row = q("agg_atkinson").head()
    assert(row.getAs[Long]("n_customers") == n)
    assert(math.abs(row.getAs[Double]("geomean_cents") - geo) <
      geo * 1e-6 + 0.02)
    assert(math.abs(row.getAs[Double]("mean_cents") - mean) < 0.02)
    assert(math.abs(row.getAs[Double]("atkinson") - (1 - geo / mean))
      < 1e-3)
  }

  test("agg_geomean and agg_harmonic_mean match direct means") {
    val byFlag = li.groupBy(_._1)
    for (r <- q("agg_geomean").collect()) {
      val ps = byFlag(r.getAs[String]("l_returnflag")).map(_._3)
      val geo = math.exp(ps.map(math.log).sum / ps.length)
      assert(r.getAs[Long]("n") == ps.length)
      assert(math.abs(r.getAs[Double]("geo_mean_price") - geo) <
        geo * 1e-6 + 1e-2)
    }
    for (r <- q("agg_harmonic_mean").collect()) {
      val ps = byFlag(r.getAs[String]("l_returnflag")).map(_._3)
      val h = ps.length / ps.map(1.0 / _).sum
      assert(math.abs(r.getAs[Double]("harmonic_mean_price") - h) <
        h * 1e-6 + 1e-2)
    }
  }
}
