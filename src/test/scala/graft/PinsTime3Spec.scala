package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, time-series family part 3 —
  * R/S analysis, recursions, changepoints and survival curves (see
  * PinsAbSpec for the discipline).
  */
class PinsTime3Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val daily: Array[(java.time.LocalDate, Long)] =
    Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toArray
      .map { case (d, xs) => (d, xs.map(_._2).sum) }
      .sortBy(_._1.toEpochDay)

  private lazy val c: Array[Long] = daily.map(_._2)

  test("time_hurst_rs matches a direct rescaled-range recomputation") {
    def medianRs(n: Int): (Int, Double) = {
      val blocks = c.grouped(n).filter(_.length == n).toArray
      val rss = blocks.zipWithIndex.flatMap { case (b, blk) =>
        val mean = b.sum.toDouble / n
        var cum = 0.0
        val devs = b.map { v => cum += v - mean; cum }
        val r = math.max(devs.max, 0.0) - math.min(devs.min, 0.0)
        val sigma = math.sqrt(b.map(v => (v - mean) * (v - mean)).sum / n)
        if (sigma > 0) Some((r / sigma, blk)) else None
      }
      val sorted = rss.sortBy(identity)
      (rss.length, sorted((rss.length + 1) / 2 - 1)._1)
    }
    val rows = q("time_hurst_rs").collect()
    assert(rows.length == 3)
    val med = Map(8 -> medianRs(8), 16 -> medianRs(16),
      32 -> medianRs(32))
    val hurst = (math.log(med(32)._2) - math.log(med(8)._2)) /
      (2 * math.log(2))
    for (r <- rows) {
      val n = r.getAs[Int]("n")
      assert(r.getAs[Long]("n_blocks") == med(n)._1)
      assert(math.abs(r.getAs[Double]("median_rs") - med(n)._2) < 1e-3)
      assert(math.abs(r.getAs[Double]("hurst") - hurst) < 1e-3)
    }
  }

  test("time_cross_corr matches direct lagged Pearson between streams") {
    val ev = Tables.events(spark, sf)
      .select(col("ts").cast("date"), col("event_type"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getString(1)))
    val byDay = ev.groupBy(_._1).view.mapValues { xs =>
      (xs.count(_._2 == "view").toDouble,
        xs.count(_._2 == "purchase").toDouble) }.toMap
    val rows = q("time_cross_corr").collect()
    assert(rows.length == 7)
    for (r <- rows) {
      val k = r.getAs[Int]("k")
      val pairs = byDay.keys.toSeq.flatMap { d =>
        byDay.get(d.plusDays(k)).map(o => (byDay(d)._1, o._2)) }
      val n = pairs.length.toDouble
      val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val rho = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(r.getAs[Long]("n_pairs") == pairs.length)
      assert(math.abs(r.getAs[Double]("xcorr") - rho) < 1e-3)
    }
  }

  test("time_holt_linear matches a direct double-exponential walk") {
    var l = c(0).toDouble; var b = 0.0
    for (t <- 1 until c.length) {
      val lNew = 0.5 * c(t) + 0.5 * (l + b)
      b = 0.5 * (lNew - l) + 0.5 * b
      l = lNew
    }
    val row = q("time_holt_linear").head()
    assert(row.getAs[Int]("n_days") == c.length)
    assert(math.abs(row.getAs[Double]("level") - l / 100) < 1e-6)
    assert(math.abs(row.getAs[Double]("trend") - b / 100) < 1e-6)
    assert(math.abs(row.getAs[Double]("forecast_2") -
      (l + 2 * b) / 100) < 1e-6)
  }

  test("time_changepoint matches a direct minimum-SSE split scan") {
    val n = c.length
    val grand = c.map(_.toDouble)
    def sse(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(v => (v - m) * (v - m)).sum
    }
    val costs = (1 until n).map { t =>
      (t, sse(grand.take(t)) + sse(grand.drop(t))) }
    val (bestT, bestCost) = costs.minBy { case (t, cst) => (cst, t) }
    val row = q("time_changepoint").head()
    assert(row.getDate(0).toLocalDate == daily(bestT - 1)._1)
    assert(row.getAs[Long]("n_left") == bestT)
    assert(row.getAs[Long]("n_right") == n - bestT)
    assert(math.abs(row.getAs[Double]("mean_left") -
      grand.take(bestT).sum / bestT / 100.0) < 1e-2)
    assert(math.abs(row.getAs[Double]("sse_drop_pct") -
      (1.0 - bestCost / sse(grand))) < 1e-3)
  }

  test("time_pacf matches a Durbin-Levinson recursion on pair ACFs") {
    def pairRho(k: Int): Double = {
      val xs = (k until c.length).map(c(_).toDouble)
      val ys = (k until c.length).map(t => c(t - k).toDouble)
      val n = xs.length
      val mx = xs.sum / n; val my = ys.sum / n
      xs.zip(ys).map { case (a, b2) => (a - mx) * (b2 - my) }.sum /
        math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
          ys.map(b2 => (b2 - my) * (b2 - my)).sum)
    }
    val r1 = pairRho(1); val r2 = pairRho(2); val r3 = pairRho(3)
    val pacf2 = (r2 - r1 * r1) / (1 - r1 * r1)
    val phi21 = r1 * (1 - r2) / (1 - r1 * r1)
    val pacf3 = (r3 - phi21 * r2 - pacf2 * r1) /
      (1 - phi21 * r1 - pacf2 * r2)
    val rows = q("time_pacf").collect()
    assert(rows.length == 3)
    val expect = Map(1 -> (r1, r1), 2 -> (r2, pacf2), 3 -> (r3, pacf3))
    for (r <- rows) {
      val (rho, pf) = expect(r.getAs[Int]("k"))
      assert(math.abs(r.getAs[Double]("autocorr") - rho) < 1e-3)
      assert(math.abs(r.getAs[Double]("pacf") - pf) < 1e-3)
    }
  }

  test("time_control_chart matches direct XmR limits") {
    val ev = Tables.events(spark, sf)
      .select(col("ts").cast("date"),
        expr("CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toArray.map { case (d, xs) => (d, xs.map(_._2).sum) }
      .sortBy(_._1.toEpochDay)
    val vals = ev.map(_._2)
    val xbar = vals.sum.toDouble / vals.length
    val mrs = (1 until vals.length).map(i =>
      math.abs(vals(i) - vals(i - 1)))
    val mrbar = mrs.sum.toDouble / mrs.length
    val ucl = xbar + 2.66 * mrbar
    val lcl = xbar - 2.66 * mrbar
    val rows = q("time_control_chart").collect()
    assert(rows.length == ev.length)
    rows.zip(ev).foreach { case (r, (d, v)) =>
      assert(r.getDate(0).toLocalDate == d)
      assert(math.abs(r.getAs[Double]("center") - xbar / 100.0) < 1e-2)
      assert(math.abs(r.getAs[Double]("ucl") - ucl / 100.0) < 1e-1)
      assert(math.abs(r.getAs[Double]("lcl") - lcl / 100.0) < 1e-1)
      // violation flag uses the exact integer limits — allow the
      // rounded recomputation only away from the boundary
      val margin = math.abs(math.abs(v - xbar) - 2.66 * mrbar)
      if (margin > 1.0)
        assert(r.getAs[Boolean]("violation") ==
          (v > ucl || v < lcl), s"day $d")
    }
  }

  test("time_seasonal_mk matches a direct per-month sign-pair sum") {
    val my = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(x => (x._1.getMonthValue, x._1.getYear))
      .view.mapValues(_.map(_._2).sum).toMap
    var sTot = 0L
    for (((m1, y1), v1) <- my; ((m2, y2), v2) <- my
         if m1 == m2 && y2 > y1)
      sTot += java.lang.Long.signum(v2 - v1)
    val varS = my.keys.groupBy(_._1).values.map { g =>
      val nm = g.size.toLong; nm * (nm - 1) * (2 * nm + 5) }.sum / 18.0
    val z = if (sTot > 0) (sTot - 1) / math.sqrt(varS)
      else if (sTot < 0) (sTot + 1) / math.sqrt(varS) else 0.0
    val row = q("time_seasonal_mk").head()
    assert(row.getAs[Long]("s_total") == sTot)
    assert(math.abs(row.getAs[Double]("var_s") - varS) < 1e-3)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-3)
    assert(row.getAs[Boolean]("trend_05") == (math.abs(z) > 1.96))
  }

  test("time_survival_km matches a direct Kaplan-Meier product") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("CAST(unix_micros(ts) / 86400000000L AS LONG)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val d0 = ev.filter(_._2 == "click").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val dp = ev.filter(_._2 == "purchase").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val tEvents = d0.flatMap { case (u, t0) =>
      dp.get(u).filter(_ >= t0).map(_ - t0) }.toSeq
    val nTotal = d0.size
    val byT = tEvents.groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy(_._1)
    var atRisk = nTotal.toLong
    var surv = 1.0
    val rows = q("time_survival_km").collect()
    assert(rows.length == byT.size)
    rows.zip(byT).foreach { case (r, (t, dEv)) =>
      surv *= 1.0 - dEv.toDouble / atRisk
      assert(r.getAs[Long]("day") == t)
      assert(r.getAs[Long]("n_risk") == atRisk)
      assert(r.getAs[Long]("d_events") == dEv)
      assert(math.abs(r.getAs[Double]("survival") - surv) < 1e-3,
        s"t=$t")
      atRisk -= dEv
    }
  }
}
