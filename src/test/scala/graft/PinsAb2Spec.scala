package graft

import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, A/B family part 2 — the
  * orders/lineitem-based designs (see PinsAbSpec for the discipline:
  * brute-force textbook recomputation in plain Scala over raw
  * sf0.001 rows; loose 1e-3 tolerances target formula drift, not
  * rounding spelling).
  */
class PinsAb2Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (custkey, cents, date, status, priority) raw order rows. */
  private lazy val ord: Array[(Long, Long, LocalDate, String, String)] =
    Tables.orders(spark, sf)
      .select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"),
        col("o_orderdate").cast("date"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getDate(2).toLocalDate, r.getString(3), r.getString(4)))

  private lazy val ordPrice: Array[(Long, Double, String)] =
    Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))

  /** (quantity, isReturned) for the R/A lineitem two-sample designs. */
  private lazy val ra: Array[(Int, Boolean)] =
    Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_quantity").cast("int"), col("l_returnflag"))
      .collect().map(r => (r.getInt(0), r.getString(1) == "R"))

  private lazy val evUser: Array[(Long, String, Long, Double,
      LocalDate)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)"),
        col("value"), col("ts").cast("date"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDate(4).toLocalDate))

  test("ab_power_mde matches a direct pooled-sd MDE recomputation") {
    // .toArray BEFORE .map — a Map would dedup the (arm, spend) pairs
    val pu = evUser.groupBy(_._1).toArray.map { case (u, xs) =>
      (u % 2, xs.map(_._3).sum.toDouble) }
    val n0 = pu.count(_._1 == 0L); val n1 = pu.count(_._1 == 1L)
    val xs = pu.map(_._2)
    val n = xs.length
    val mean = xs.sum / n
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum /
      (n - 1))
    val mdeAbs = 2.8016 * math.sqrt(2.0 * sd * sd / math.min(n0, n1))
    val row = q("ab_power_mde").head()
    assert(row.getAs[Long]("n0") == n0 && row.getAs[Long]("n1") == n1)
    assert(math.abs(row.getAs[Double]("mean_spend") - mean / 100.0)
      < 1e-3)
    assert(math.abs(row.getAs[Double]("sd_spend") - sd / 100.0) < 1e-3)
    assert(math.abs(row.getAs[Double]("mde_abs") - mdeAbs / 100.0)
      < 1e-3)
    assert(math.abs(row.getAs[Double]("mde_rel") - mdeAbs / mean)
      < 1e-3)
  }

  test("ab_sequential_sprt matches a direct Wald-LLR walk") {
    // treatment-arm users: entry day + converted-ever flag
    val users = evUser.groupBy(_._1).toArray.collect {
      case (u, xs) if u % 2 == 1 =>
        (xs.map(_._5).min, if (xs.exists(_._2 == "purchase")) 1 else 0)
    }
    val daily = users.groupBy(_._1).view
      .mapValues(xs => (xs.length.toLong, xs.map(_._2).sum.toLong))
      .toSeq.sortBy(_._1.toEpochDay)
    var n = 0L; var k = 0L
    val expected = daily.map { case (day, (nd, kd)) =>
      n += nd; k += kd
      val llr = k * math.log(0.10 / 0.08) +
        (n - k) * math.log(0.90 / 0.92)
      val dec =
        if (llr >= math.log(0.80 / 0.05)) "accept_h1"
        else if (llr <= math.log(0.20 / 0.95)) "accept_h0"
        else "continue"
      (day, n, k, llr, dec)
    }
    val rows = q("ab_sequential_sprt").collect()
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (day, en, ek, llr, dec)) =>
      assert(r.getDate(0).toLocalDate == day)
      assert(r.getAs[Long]("n") == en && r.getAs[Long]("k") == ek)
      assert(math.abs(r.getAs[Double]("llr") - llr) < 1e-3)
      assert(r.getAs[String]("decision") == dec)
    }
  }

  test("ab_stratified_cmh matches a direct Mantel-Haenszel pooled OR") {
    val strata = ordPrice.groupBy(_._3).toSeq.sortBy(_._1)
    var sad = 0.0; var sbc = 0.0
    val perStratum = strata.map { case (st, rowsIn) =>
      val a = rowsIn.count(x => x._1 % 2 == 1 && x._2 > 150000.0)
      val b = rowsIn.count(x => x._1 % 2 == 1 && x._2 <= 150000.0)
      val c = rowsIn.count(x => x._1 % 2 == 0 && x._2 > 150000.0)
      val dd = rowsIn.count(x => x._1 % 2 == 0 && x._2 <= 150000.0)
      val n = (a + b + c + dd).toDouble
      sad += a.toDouble * dd / n; sbc += b.toDouble * c / n
      (st, a, b, c, dd)
    }
    val cmh = sad / sbc
    val rows = q("ab_stratified_cmh").collect()
    assert(rows.length == perStratum.length)
    rows.zip(perStratum).foreach {
      case (r, (st, a, b, c, dd)) =>
        assert(r.getAs[String]("stratum") == st)
        assert(r.getAs[Long]("a") == a && r.getAs[Long]("d") == dd)
        if (b > 0 && c > 0)
          assert(math.abs(r.getAs[Double]("or_stratum") -
            a.toDouble * dd / (b.toDouble * c)) < 1e-3)
        assert(math.abs(r.getAs[Double]("cmh_or") - cmh) < 1e-3)
    }
  }

  test("ab_diff_in_diff matches a direct four-cell recomputation") {
    val cut = LocalDate.parse("1996-07-01")
    def cellStats(arm: Long, post: Boolean) = {
      val ys = ord.filter(x => x._1 % 2 == arm &&
        !x._3.isBefore(cut) == post).map(_._2.toDouble)
      val n = ys.length
      val m = ys.sum / n
      // variance OF THE MEAN with the sample (n-1) correction
      val v = ys.map(y => (y - m) * (y - m)).sum / (n - 1) / n
      (n, m, v)
    }
    val (n11, m11, v11) = cellStats(1, post = true)
    val (n10, m10, v10) = cellStats(1, post = false)
    val (n01, m01, v01) = cellStats(0, post = true)
    val (n00, m00, v00) = cellStats(0, post = false)
    val did = (m11 - m10 - (m01 - m00)) / 100.0
    val se = math.sqrt(v11 + v10 + v01 + v00) / 100.0
    val row = q("ab_diff_in_diff").head()
    assert(row.getAs[Long]("n11") == n11 &&
      row.getAs[Long]("n00") == n00)
    assert(math.abs(row.getAs[Double]("m_treat_post") - m11 / 100.0)
      < 1e-2)
    assert(math.abs(row.getAs[Double]("did") - did) < 1e-2)
    assert(math.abs(row.getAs[Double]("se") - se) < 1e-3)
    assert(math.abs(row.getAs[Double]("t_stat") - did / se) < 1e-3)
  }

  test("ab_ks_2sample matches a direct two-sample KS recomputation") {
    val s1 = ra.filter(_._2).map(_._1).sorted
    val s0 = ra.filterNot(_._2).map(_._1).sorted
    val n1 = s1.length; val n0 = s0.length
    val values = (s1 ++ s0).distinct.sorted
    val dMax = values.map { v =>
      math.abs(s1.count(_ <= v).toDouble / n1 -
        s0.count(_ <= v).toDouble / n0)
    }.max
    val lam2 = dMax * dMax * n1.toDouble * n0 / (n1 + n0)
    val p = math.min(1.0, 2.0 * math.exp(-2.0 * lam2))
    val row = q("ab_ks_2sample").head()
    assert(row.getAs[Long]("n_returned") == n1)
    assert(row.getAs[Long]("n_acknowledged") == n0)
    assert(math.abs(row.getAs[Double]("ks_d") - dMax) < 1e-3)
    assert(math.abs(row.getAs[Double]("p_value") - p) < 1e-3)
    assert(row.getAs[Boolean]("significant") ==
      (2.0 * math.exp(-2.0 * lam2) < 0.05))
  }

  test("ab_friedman matches a direct blocked midrank chi2") {
    // block = weekday, treatment = priority digit, y = exact cents
    val cells = ord.groupBy(x =>
        (x._3.getDayOfWeek.getValue, x._5.substring(0, 1).toInt))
      .view.mapValues(_.map(_._2).sum).toMap
    val blocks = cells.keys.map(_._1).toSeq.distinct
    val k = cells.keys.map(_._2).toSeq.distinct.size
    assert(k == 5)
    val rankSums = Array.fill(6)(0.0)
    for (b <- blocks) {
      val ys = (1 to 5).map(t => (t, cells((b, t))))
      val sortedVals = ys.map(_._2).sorted
      for ((t, y) <- ys) {
        val lt = sortedVals.count(_ < y)
        val eq = sortedVals.count(_ == y)
        rankSums(t) += lt + (eq + 1) / 2.0
      }
    }
    val bN = blocks.size.toDouble
    val chi2 = 12.0 / (bN * k * (k + 1)) *
      (1 to 5).map(t => rankSums(t) * rankSums(t)).sum -
      3.0 * bN * (k + 1)
    val row = q("ab_friedman").head()
    assert(row.getAs[Long]("n_blocks") == blocks.size)
    assert(row.getAs[Long]("n_treatments") == k)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-3)
  }

  test("ab_quantile_effects matches direct per-decile quantiles") {
    val s1 = ra.filter(_._2).map(_._1).sorted
    val s0 = ra.filterNot(_._2).map(_._1).sorted
    val rows = q("ab_quantile_effects").collect()
    assert(rows.length == 9)
    for (r <- rows) {
      val dec = r.getAs[Long]("decile").toInt
      val k1 = (dec * s1.length + 9) / 10
      val k0 = (dec * s0.length + 9) / 10
      assert(r.getAs[Int]("q_returned") == s1(k1 - 1))
      assert(r.getAs[Int]("q_acknowledged") == s0(k0 - 1))
      assert(r.getAs[Int]("qte") == s1(k1 - 1) - s0(k0 - 1))
    }
  }

  test("ab_bayes_factor_bic matches a direct BIC log-Bayes-factor") {
    val conv = evUser.groupBy(_._1).view.mapValues(xs =>
      if (xs.exists(x => x._2 == "purchase" && x._4 > 100.0)) 1
      else 0).toMap
    val g0 = conv.filter(_._1 % 2 == 0); val g1 = conv.filter(_._1 % 2 == 1)
    val (n0, k0) = (g0.size, g0.values.sum)
    val (n1, k1) = (g1.size, g1.values.sum)
    def binLL(k: Int, n: Int): Double =
      if (k == 0 || k == n) 0.0
      else k * math.log(k.toDouble / n) +
        (n - k) * math.log(1.0 - k.toDouble / n)
    val lnBf = binLL(k0, n0) + binLL(k1, n1) -
      binLL(k0 + k1, n0 + n1) - 0.5 * math.log((n0 + n1).toDouble)
    val row = q("ab_bayes_factor_bic").head()
    assert(row.getAs[Long]("n_ctrl") == n0 &&
      row.getAs[Long]("conv_treat") == k1)
    assert(math.abs(row.getAs[Double]("ln_bf10") - lnBf) < 1e-3)
    val ev = if (lnBf < 0) "favors_null" else if (lnBf < 1) "weak"
      else if (lnBf < 3) "positive" else if (lnBf < 5) "strong"
      else "very_strong"
    assert(row.getAs[String]("evidence") == ev)
  }

  test("ab_cochran_armitage matches a direct trend-test z") {
    val doses = ord.map(x => (x._5.substring(0, 1).toLong,
      x._4 == "F"))
    val nn = doses.length.toDouble
    val kk = doses.count(_._2).toDouble
    val s1 = doses.map(_._1).sum.toDouble
    val s2 = doses.map(x => x._1 * x._1).sum.toDouble
    val t1 = doses.filter(_._2).map(_._1).sum.toDouble
    val a = nn * t1 - kk * s1
    val prod = kk * (nn - kk) * (nn * s2 - s1 * s1)
    val z = a * math.sqrt(nn) / math.sqrt(prod)
    val row = q("ab_cochran_armitage").head()
    assert(row.getAs[Long]("n") == doses.length)
    assert(row.getAs[Long]("conversions") == kk.toLong)
    assert(math.abs(row.getAs[Double]("z_trend") - z) < 1e-3)
    assert(row.getAs[Boolean]("significant_05") == (z * z > 3.8415))
  }

  test("ab_cochran_q matches the textbook k=3 Q statistic") {
    val flags = ord.groupBy(_._1).view.mapValues { xs =>
      val ys = xs.map(_._3.getYear).toSet
      (if (ys(1995)) 1 else 0, if (ys(1996)) 1 else 0,
        if (ys(1997)) 1 else 0)
    }.toMap
    val t1 = flags.values.map(_._1).sum.toDouble
    val t2 = flags.values.map(_._2).sum.toDouble
    val t3 = flags.values.map(_._3).sum.toDouble
    val u = flags.values.map(f => f._1 + f._2 + f._3)
    val k = 3.0
    val qStat = (k - 1) *
      (k * (t1 * t1 + t2 * t2 + t3 * t3) -
        math.pow(t1 + t2 + t3, 2)) /
      (k * u.sum - u.map(x => x * x).sum)
    val row = q("ab_cochran_q").head()
    assert(row.getAs[Long]("n_subjects") == flags.size)
    assert(row.getAs[Long]("active_1995") == t1.toLong)
    assert(math.abs(row.getAs[Double]("q") - qStat) < 1e-3)
  }

  test("ab_fieller_ci matches a direct Fieller interval") {
    val byArm = ord.groupBy(_._1 % 2).view
      .mapValues(_.map(_._2.toDouble)).toMap
    def stats(xs: Array[Double]) = {
      val n = xs.length; val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1) / n
      (n, m, v)
    }
    val (_, m1, v1) = stats(byArm(1L))
    val (_, m0, v0) = stats(byArm(0L))
    val c = 3.841458820694124
    val zc = 1.959963984540054
    val den = m0 * m0 - c * v0
    val disc = m0 * m0 * v1 + m1 * m1 * v0 - c * v1 * v0
    val row = q("ab_fieller_ci").head()
    assert(math.abs(row.getAs[Double]("ratio") - m1 / m0) < 1e-3)
    assert(math.abs(row.getAs[Double]("ci_lo") -
      (m1 * m0 - zc * math.sqrt(disc)) / den) < 1e-3)
    assert(math.abs(row.getAs[Double]("ci_hi") -
      (m1 * m0 + zc * math.sqrt(disc)) / den) < 1e-3)
    assert(row.getAs[Boolean]("bounded") == (den > 0))
  }

  test("ab_sign_test matches a direct paired-sign recomputation") {
    val pc = ord.groupBy(_._1).view.mapValues { xs =>
      (xs.filter(_._3.getYear == 1995).map(_._2).sum,
        xs.filter(_._3.getYear == 1996).map(_._2).sum)
    }.toMap
    val sUp = pc.values.count(x => x._2 > x._1)
    val sDown = pc.values.count(x => x._2 < x._1)
    val n = sUp + sDown
    val z = (2.0 * sUp - n) / math.sqrt(n.toDouble)
    val row = q("ab_sign_test").head()
    assert(row.getAs[Long]("n_customers") == pc.size)
    assert(row.getAs[Long]("s_up") == sUp)
    assert(row.getAs[Long]("s_down") == sDown)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-3)
    assert(row.getAs[Boolean]("significant") ==
      (z * z > 3.841458820694124))
  }
}
