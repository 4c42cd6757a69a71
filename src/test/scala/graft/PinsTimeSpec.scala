package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, time-series family — every
  * statistic rebuilt from the raw daily (or monthly) revenue series
  * in plain Scala with explicit loops/sorts (see PinsAbSpec for the
  * discipline). The shared fixture is the exact-cents daily series
  * the operators aggregate from orders.
  */
class PinsTimeSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** day-ascending exact-cents daily revenue series from orders. */
  private lazy val daily: Array[(java.time.LocalDate, Long)] =
    Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toArray.map { case (d, xs) => (d, xs.map(_._2).sum) }
      .sortBy(_._1.toEpochDay)

  private lazy val y: Array[Double] = daily.map(_._2.toDouble)
  private lazy val n: Int = y.length

  /** lag-k ACF with the global-mean/global-variance estimator. */
  private def acf(k: Int): Double = {
    val mean = y.sum / n
    val num = (k until n).map(t => (y(t) - mean) * (y(t - k) - mean)).sum
    val den = y.map(v => (v - mean) * (v - mean)).sum
    num / den
  }

  test("time_autocorr matches lag-k Pearson over pairs") {
    val rows = q("time_autocorr").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val k = r.getAs[Int]("k")
      val xs = (k until n).map(y(_))
      val ys = (k until n).map(t => y(t - k))
      val m = xs.length
      val mx = xs.sum / m; val my = ys.sum / m
      val rho = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }
        .sum / math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
          ys.map(b => (b - my) * (b - my)).sum)
      assert(r.getAs[Long]("n_pairs") == m)
      assert(math.abs(r.getAs[Double]("autocorr") - rho) < 1e-3)
    }
  }

  test("time_ljung_box matches the textbook Q statistic") {
    val r1 = acf(1); val r2 = acf(2); val r3 = acf(3)
    val qlb = n.toDouble * (n + 2) *
      (r1 * r1 / (n - 1) + r2 * r2 / (n - 2) + r3 * r3 / (n - 3))
    val row = q("time_ljung_box").head()
    assert(row.getAs[Long]("n_days") == n)
    assert(math.abs(row.getAs[Double]("r1") - r1) < 1e-3)
    assert(math.abs(row.getAs[Double]("r3") - r3) < 1e-3)
    assert(math.abs(row.getAs[Double]("q_lb") - qlb) < 1e-2)
    assert(row.getAs[Boolean]("reject_white_noise_05") ==
      (row.getAs[Double]("q_lb") > 7.815))
  }

  test("time_mann_kendall matches direct S / tie-corrected z") {
    var s = 0L
    for (i <- 0 until n; j <- i + 1 until n)
      s += java.lang.Long.signum(daily(j)._2 - daily(i)._2)
    val ties = daily.groupBy(_._2).values.map(_.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    val varS = (n.toLong * (n - 1) * (2L * n + 5) - ties) / 18.0
    val z = (s - java.lang.Long.signum(s)) / math.sqrt(varS)
    val row = q("time_mann_kendall").head()
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getAs[Long]("s_stat") == s)
    assert(math.abs(row.getAs[Double]("var_s") - varS) < 1e-6)
    assert(math.abs(row.getAs[Double]("z_score") - z) < 1e-3)
    assert(row.getAs[Int]("trend_sign") == java.lang.Long.signum(s))
  }

  test("time_max_drawdown matches a direct peak-trough walk") {
    val tc = daily.map(_._2).sum
    val mean = Math.floorDiv(tc, n.toLong)
    var cum = 0L; var peak = Long.MinValue
    var bestDd = -1L; var bestDay: java.time.LocalDate = null
    var bestPeak = 0L
    for ((day, c) <- daily) {
      cum += c - mean
      if (cum > peak) peak = cum
      val dd = peak - cum
      if (dd > bestDd) { bestDd = dd; bestDay = day; bestPeak = peak }
    }
    val row = q("time_max_drawdown").head()
    assert(row.getDate(0).toLocalDate == bestDay)
    assert(math.abs(row.getAs[Double]("max_drawdown") - bestDd / 100.0)
      < 1e-6)
    assert(math.abs(row.getAs[Double]("peak_cum") - bestPeak / 100.0)
      < 1e-6)
    if (bestPeak > 0)
      assert(math.abs(row.getAs[Double]("drawdown_pct") -
        bestDd.toDouble / bestPeak * 100.0) < 1e-2)
  }

  test("time_runs_test matches a direct runs-about-median count") {
    val sorted = daily.sortBy(x => (x._2, x._1.toEpochDay))
    val median = sorted((n + 1) / 2 - 1)._2
    val signs = daily.filter(_._2 != median).map(_._2 > median)
    val n1 = signs.count(identity); val n2 = signs.length - n1
    var runs = 1
    for (i <- 1 until signs.length)
      if (signs(i) != signs(i - 1)) runs += 1
    val nn = (n1 + n2).toDouble
    val mu = 2.0 * n1 * n2 / nn + 1
    val sd = math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) /
      (nn * nn * (nn - 1)))
    val row = q("time_runs_test").head()
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("n2") == n2)
    assert(row.getAs[Long]("runs") == runs)
    assert(math.abs(row.getAs[Double]("z") - (runs - mu) / sd) < 1e-3)
  }

  test("time_kpss matches the textbook level-stationarity eta") {
    val mean = y.sum / n
    var cum = 0.0
    val sst2 = y.map { v => cum += v - mean; cum * cum }.sum
    val s2 = y.map(v => (v - mean) * (v - mean)).sum / n
    val eta = sst2 / (n.toDouble * n) / s2
    val row = q("time_kpss").head()
    assert(row.getAs[Long]("n_days") == n)
    assert(math.abs(row.getAs[Double]("kpss_eta") - eta) < 1e-3)
    assert(row.getAs[Boolean]("reject_stationary_05") == (eta > 0.463))
  }

  test("time_adf matches a direct two-regressor Dickey-Fuller solve") {
    // rows t >= 2: dy_t on (y_{t-1}, dy_{t-1}) with intercept
    val dy = (1 until n).map(t => y(t) - y(t - 1))
    val rows = (1 until dy.length).map { i =>
      (dy(i), y(i), dy(i - 1)) } // (resp, ylag, dylag)
    val m = rows.length.toDouble
    val mr = rows.map(_._1).sum / m
    val mx = rows.map(_._2).sum / m
    val mz = rows.map(_._3).sum / m
    val cxx = rows.map(r => (r._2 - mx) * (r._2 - mx)).sum
    val czz = rows.map(r => (r._3 - mz) * (r._3 - mz)).sum
    val cxz = rows.map(r => (r._2 - mx) * (r._3 - mz)).sum
    val cxr = rows.map(r => (r._2 - mx) * (r._1 - mr)).sum
    val czr = rows.map(r => (r._3 - mz) * (r._1 - mr)).sum
    val det = cxx * czz - cxz * cxz
    val rho = (czz * cxr - cxz * czr) / det
    val phi = (cxx * czr - cxz * cxr) / det
    val rss = rows.map { r =>
      val e = (r._1 - mr) - rho * (r._2 - mx) - phi * (r._3 - mz)
      e * e
    }.sum
    val tStat = rho / math.sqrt(rss / (m - 3) * czz / det)
    val row = q("time_adf").head()
    assert(row.getAs[Long]("n_obs") == rows.length)
    assert(math.abs(row.getAs[Double]("rho") - rho) < 1e-3)
    assert(math.abs(row.getAs[Double]("adf_t") - tStat) < 1e-3)
    assert(row.getAs[Boolean]("stationary_05") == (tStat < -2.86))
  }

  test("time_permutation_entropy matches a direct ordinal census") {
    def pat(a: Long, b: Long, c: Long): Int =
      if (a <= b && b <= c) 0
      else if (a <= b && a <= c) 1
      else if (a <= b) 2
      else if (a <= c) 3
      else if (b <= c) 4
      else 5
    val cents = daily.map(_._2)
    val pats = (2 until n).map(t => pat(cents(t - 2), cents(t - 1),
      cents(t)))
    val m = pats.length.toDouble
    val h = -(0 to 5).map { p =>
      val c = pats.count(_ == p)
      if (c > 0) (c / m) * math.log(c / m) else 0.0
    }.sum / math.log(6.0)
    val row = q("time_permutation_entropy").head()
    assert(row.getAs[Long]("n") == pats.length)
    for (p <- 0 to 5)
      assert(row.getAs[Long](s"c$p") == pats.count(_ == p))
    assert(math.abs(row.getAs[Double]("perm_entropy") - h) < 1e-3)
  }

  test("time_theil_u2 matches direct lag-7 vs naive RMSE ratio") {
    val cents = daily.map(_._2)
    val idx = (7 until n)
    val sse7 = idx.map(t => { val e = (cents(t) - cents(t - 7)).toDouble
      e * e }).sum
    val sse1 = idx.map(t => { val e = (cents(t) - cents(t - 1)).toDouble
      e * e }).sum
    val row = q("time_theil_u2").head()
    assert(row.getAs[Long]("n_days") == idx.length)
    assert(math.abs(row.getAs[Double]("rmse_lag7_cents") -
      math.sqrt(sse7 / idx.length)) < 1e-2)
    assert(math.abs(row.getAs[Double]("theil_u2") -
      math.sqrt(sse7 / sse1)) < 1e-3)
    assert(row.getAs[Boolean]("beats_naive") == (sse7 < sse1))
  }

  test("time_mase matches direct scaled absolute errors") {
    val cents = daily.map(_._2)
    val idx = (7 until n)
    val sae7 = idx.map(t => math.abs(cents(t) - cents(t - 7))).sum
    val sae1 = idx.map(t => math.abs(cents(t) - cents(t - 1))).sum
    val row = q("time_mase").head()
    assert(row.getAs[Long]("n_days") == idx.length)
    assert(math.abs(row.getAs[Double]("mae_lag7_cents") -
      sae7.toDouble / idx.length) < 1e-2)
    assert(math.abs(row.getAs[Double]("mase") -
      sae7.toDouble / sae1) < 1e-3)
    assert(row.getAs[Boolean]("beats_naive") == (sae7 < sae1))
  }

  test("time_rsi matches a direct 14-day gain/loss window") {
    val cents = daily.map(_._2)
    val deltas = (1 until n).map(t =>
      (daily(t)._1, cents(t) - cents(t - 1)))
    val rows = q("time_rsi").collect()
    assert(rows.length == deltas.length - 13)
    for (r <- rows) {
      val day = r.getDate(0).toLocalDate
      val i = deltas.indexWhere(_._1 == day)
      val win = deltas.slice(i - 13, i + 1).map(_._2)
      val g = win.filter(_ > 0).sum.toDouble
      val l = -win.filter(_ < 0).sum.toDouble
      if (g + l > 0)
        assert(math.abs(r.getAs[Double]("rsi14") -
          100.0 * g / (g + l)) < 1e-3, s"day $day")
      else assert(r.isNullAt(r.fieldIndex("rsi14")))
    }
  }

  test("time_variance_ratio matches the Lo-MacKinlay VR(5)") {
    val cents = daily.map(_._2)
    val idx = (5 until n)
    val d1 = idx.map(t => (cents(t) - cents(t - 1)).toDouble)
    val d5 = idx.map(t => (cents(t) - cents(t - 5)).toDouble)
    val m = idx.length.toDouble
    val vnum = d5.map(v => v * v).sum * m - math.pow(d5.sum, 2)
    val vden = 5.0 * (d1.map(v => v * v).sum * m - math.pow(d1.sum, 2))
    val row = q("time_variance_ratio").head()
    assert(row.getAs[Long]("n_days") == idx.length)
    assert(math.abs(row.getAs[Double]("vr5") - vnum / vden) < 1e-3)
    assert(row.getAs[Boolean]("mean_reverting") == (vnum < vden))
  }

  test("time_pettitt matches a direct rank-based change-point scan") {
    val mid = {
      val byVal = daily.groupBy(_._2).view.mapValues(_.length).toMap
      var cum = 0L
      byVal.toSeq.sortBy(_._1).map { case (v, t) =>
        val m = cum + (t + 1) / 2.0; cum += t; (v, m)
      }.toMap
    }
    var u = 0.0
    var bestK = -1.0; var bestDay: java.time.LocalDate = null
    for (t <- 0 until n - 1) {
      u += 2 * mid(daily(t)._2) - (n + 1)
      if (math.abs(u) > bestK) {
        bestK = math.abs(u); bestDay = daily(t)._1
      }
    }
    val p = 2.0 * math.exp(-6.0 * bestK * bestK /
      (math.pow(n, 3) + math.pow(n, 2)))
    val row = q("time_pettitt").head()
    assert(row.getAs[Long]("n_days") == n)
    assert(row.getDate(1).toLocalDate == bestDay)
    assert(row.getAs[Long]("k_stat") == bestK.toLong)
    assert(math.abs(row.getAs[Double]("p_value") - p) < 1e-3)
  }

  test("time_ar1_halflife matches a direct AR(1) OLS fit") {
    val pairs = (1 until n).map(t => (y(t - 1), y(t)))
    val m = pairs.length.toDouble
    val mx = pairs.map(_._1).sum / m; val my = pairs.map(_._2).sum / m
    val phi = pairs.map { case (a, b) => (a - mx) * (b - my) }.sum /
      pairs.map { case (a, _) => (a - mx) * (a - mx) }.sum
    val row = q("time_ar1_halflife").head()
    assert(row.getAs[Long]("n_pairs") == pairs.length)
    assert(math.abs(row.getAs[Double]("phi") - phi) < 1e-3)
    if (phi > 0 && phi < 1)
      assert(math.abs(row.getAs[Double]("halflife_days") -
        math.log(2) / (-math.log(phi))) < 1e-2)
  }

  test("time_mean_crossings matches a direct side-change count") {
    val ev = Tables.events(spark, sf)
      .select(col("ts").cast("date"),
        expr("CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toArray
      .map { case (d, xs) => (d, xs.map(_._2).sum) }
      .sortBy(_._1.toEpochDay)
    val nd = ev.length
    val sc = ev.map(_._2).sum
    val sides = ev.map(x => if (x._2 * nd > sc) 1 else -1)
    var crossings = 0L
    for (i <- 1 until nd) if (sides(i) != sides(i - 1)) crossings += 1
    val row = q("time_mean_crossings").head()
    assert(row.getAs[Long]("n_days") == nd)
    assert(row.getAs[Long]("n_crossings") == crossings)
    assert(math.abs(row.getAs[Double]("crossing_rate") -
      crossings.toDouble / (nd - 1)) < 1e-3)
  }

  /** month-index → exact monthly revenue cents. */
  private lazy val monthly: Array[(Int, Long)] =
    Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(x => x._1.getYear * 12 + x._1.getMonthValue - 1)
      .toArray.map { case (mi, xs) => (mi, xs.map(_._2).sum) }
      .sortBy(_._1)

  test("time_theilsen_trend matches a direct pairwise-slope median") {
    val pairs = for {
      i <- monthly.indices; j <- (i + 1) until monthly.length
    } yield {
      val (m1, c1) = monthly(i); val (m2, c2) = monthly(j)
      ((c2 - c1).toDouble / 100.0 / (m2 - m1), m1, m2)
    }
    val sorted = pairs.sortBy(p => (p._1, p._2, p._3))
    val sel = sorted((pairs.length + 1) / 2 - 1)._1
    val row = q("time_theilsen_trend").head()
    assert(row.getAs[Long]("n_pairs") == pairs.length)
    assert(math.abs(row.getAs[Double]("sen_slope_per_month") - sel)
      < 1e-3)
  }

  test("time_velocity_accel matches direct first/second differences") {
    val rows = q("time_velocity_accel").collect()
    assert(rows.length == monthly.length)
    rows.zip(monthly.zipWithIndex).foreach {
      case (r, ((mi, rc), i)) =>
        assert(r.getAs[String]("month") ==
          f"${mi / 12}%d-${mi % 12 + 1}%02d")
        assert(math.abs(r.getAs[Double]("revenue") - rc / 100.0) < 1e-6)
        if (i == 0) assert(r.isNullAt(r.fieldIndex("velocity")))
        else {
          val vel = (rc - monthly(i - 1)._2) / 100.0
          assert(math.abs(r.getAs[Double]("velocity") - vel) < 1e-6)
          if (i >= 2) {
            val prevVel = (monthly(i - 1)._2 - monthly(i - 2)._2) / 100.0
            assert(math.abs(r.getAs[Double]("acceleration") -
              (vel - prevVel)) < 1e-6)
          }
        }
    }
  }
}
