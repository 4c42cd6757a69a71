package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles recomputation pins, A/B-test family
  * (the Wave8Spec discipline extended per the r10 verdict: the
  * Spark/DuckDB parity gate proves the ENGINES agree, these prove the
  * agreed number is the textbook statistic, so a formula error
  * transcribed into both engines still fails CI).
  *
  * Every test rebuilds the statistic from the RAW sf0.001 events rows
  * in plain Scala — per-user aggregation, ranking, variance algebra
  * all re-derived here, none of the query's algebraic rearrangements
  * reused. Tolerances are loose (1e-3) on purpose: they target
  * formula regressions, not rounding spelling (the oracle gate owns
  * digit-exact parity).
  */
class PinsAbSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Raw event rows: (user_id, event_type, cents, value). cents is
    * the engine's exact DECIMAL(18,2)*100 money unit (same half-up
    * double→decimal cast Spark applies). */
  private lazy val ev: Array[(Long, String, Long, Double)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))

  /** user_id -> summed per-event cents. */
  private lazy val centsByUser: Map[Long, Long] =
    ev.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap

  /** user_id -> converted (any purchase event with value > 100). */
  private lazy val convByUser: Map[Long, Int] =
    ev.groupBy(_._1).view
      .mapValues(xs => if (xs.exists(x =>
        x._2 == "purchase" && x._4 > 100.0)) 1 else 0)
      .toMap

  test("ab_test matches a direct pooled-proportion z recomputation") {
    val arms = convByUser.groupBy { case (u, _) => u % 2 }
    val (na, ca) = (arms(0L).size, arms(0L).values.sum)
    val (nb, cb) = (arms(1L).size, arms(1L).values.sum)
    val ra = ca.toDouble / na
    val rb = cb.toDouble / nb
    val pp = (ca + cb).toDouble / (na + nb)
    val z = (rb - ra) / math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
    val row = q("ab_test").head()
    assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("n_b") == nb)
    assert(row.getAs[Long]("conv_a") == ca)
    assert(row.getAs[Long]("conv_b") == cb)
    assert(math.abs(row.getAs[Double]("rate_a") - ra) < 1e-3)
    assert(math.abs(row.getAs[Double]("lift") - rb / ra) < 1e-3)
    assert(math.abs(row.getAs[Double]("z_score") - z) < 1e-3)
  }

  test("ab_wilson_ci matches direct Wilson interval bounds per arm") {
    val rows = q("ab_wilson_ci").collect()
    for ((armCh, rowIdx) <- Seq(("A", 0), ("B", 1))) {
      val grp = convByUser.filter { case (u, _) =>
        (if (u % 2 == 0) "A" else "B") == armCh }
      val n = grp.size
      val k = grp.values.sum
      val p = k.toDouble / n
      val z = 1.96
      val z2n = z * z / n
      val ctr = (p + z2n / 2) / (1 + z2n)
      val hw = z * math.sqrt(p * (1 - p) / n + z2n / (4.0 * n)) /
        (1 + z2n)
      val row = rows(rowIdx)
      assert(row.getAs[String]("arm") == armCh)
      assert(row.getAs[Long]("n_users") == n)
      assert(row.getAs[Long]("n_converted") == k)
      assert(math.abs(row.getAs[Double]("wilson_lo") - (ctr - hw))
        < 1e-3)
      assert(math.abs(row.getAs[Double]("wilson_hi") - (ctr + hw))
        < 1e-3)
    }
  }

  test("ab_srm matches a direct 50/50 chi-square recomputation") {
    val users = ev.map(_._1).distinct
    val kept = users.filter(u => !(u % 2 == 0 && u % 20 == 0))
    val na = kept.count(_ % 2 == 0)
    val nb = kept.count(_ % 2 == 1)
    val e = (na + nb) / 2.0
    val chi2 = ((na - e) * (na - e) + (nb - e) * (nb - e)) / e
    val row = q("ab_srm").head()
    assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("n_b") == nb)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-3)
    assert(row.getAs[Boolean]("srm_detected") == (chi2 > 3.841459))
  }

  test("ab_cuped matches a direct covariance-adjusted recomputation") {
    // per-user (pre = click money, post = purchase money), exact 2dp
    val pu = ev.groupBy(_._1).map { case (u, xs) =>
      def m(t: String) = xs.filter(_._2 == t)
        .map(x => BigDecimal(x._4).setScale(2, BigDecimal.RoundingMode
          .HALF_UP)).sum.toDouble
      (u, m("click"), m("purchase"))
    }.toArray
    val n = pu.length.toDouble
    val sx = pu.map(_._2).sum; val sy = pu.map(_._3).sum
    val sxy = pu.map(x => x._2 * x._3).sum
    val sxx = pu.map(x => x._2 * x._2).sum
    val theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val muPre = sx / n
    def armStats(a: Long) = {
      val g = pu.filter(_._1 % 2 == a)
      (g.length, g.map(_._2).sum / g.length, g.map(_._3).sum / g.length)
    }
    val (na, preA, postA) = armStats(0)
    val (nb, preB, postB) = armStats(1)
    val row = q("ab_cuped").head()
    assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("n_b") == nb)
    assert(math.abs(row.getAs[Double]("theta_r") - theta) < 1e-3)
    assert(math.abs(row.getAs[Double]("adj_mean_a") -
      (postA - theta * (preA - muPre))) < 1e-3)
    assert(math.abs(row.getAs[Double]("adj_mean_b") -
      (postB - theta * (preB - muPre))) < 1e-3)
  }

  test("ab_mann_whitney matches a brute-force midrank U and z") {
    val pu = centsByUser.toArray.map { case (u, c) => (u % 2, c) }
    val n0 = pu.count(_._1 == 0L); val n1 = pu.count(_._1 == 1L)
    // midranks over the pooled sample
    val byVal = pu.groupBy(_._2).view.mapValues(_.length).toMap
    var cum = 0L
    val mid = byVal.toSeq.sortBy(_._1).map { case (v, t) =>
      val m = cum + (t + 1) / 2.0; cum += t; (v, m)
    }.toMap
    val r1 = pu.filter(_._1 == 1L).map(x => mid(x._2)).sum
    val u1 = r1 - n1.toDouble * (n1 + 1) / 2.0
    val nn = n0 + n1
    val ties = byVal.values.map(t => t.toDouble * t * t - t).sum
    val varU = n0.toDouble * n1 / 12.0 *
      ((nn + 1).toDouble - ties / (nn.toDouble * (nn - 1)))
    val z = (u1 - n0.toDouble * n1 / 2.0) / math.sqrt(varU)
    val row = q("ab_mann_whitney").head()
    assert(row.getAs[Long]("n0") == n0 && row.getAs[Long]("n1") == n1)
    assert(math.abs(row.getAs[Number]("u1").doubleValue() - u1) < 0.51)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-3)
  }

  test("ab_delta_method matches a direct delta-variance recomputation") {
    val rows = q("ab_delta_method").collect()
    for (arm <- Seq(0L, 1L)) {
      // NB: .toArray BEFORE .map — mapping a Map with pair results
      // silently dedups by key and corrupts the sample
      val g = ev.filter(x => x._2 == "purchase" && x._1 % 2 == arm)
        .groupBy(_._1).toArray.map { case (_, xs) =>
          (xs.map(_._3).sum.toDouble, xs.length.toDouble) }
      val n = g.length.toDouble
      val my = g.map(_._1).sum / n; val mk = g.map(_._2).sum / n
      val ratio = g.map(_._1).sum / g.map(_._2).sum
      val vy = g.map(x => (x._1 - my) * (x._1 - my)).sum / n
      val vk = g.map(x => (x._2 - mk) * (x._2 - mk)).sum / n
      val cyk = g.map(x => (x._1 - my) * (x._2 - mk)).sum / n
      val s2 = vy - 2 * ratio * cyk + ratio * ratio * vk
      val se = math.sqrt(s2 / (n * mk * mk)) / 100.0
      val row = rows(arm.toInt)
      assert(row.getAs[Long]("arm") == arm)
      assert(row.getAs[Long]("n") == g.length)
      assert(math.abs(row.getAs[Double]("rev_per_purchase") -
        ratio / 100.0) < 1e-3)
      assert(math.abs(row.getAs[Double]("se") - se) < 1e-3)
    }
  }

  test("ab_odds_ratio matches a direct 2x2 Woolf-CI recomputation") {
    val cells = convByUser.groupBy { case (u, c) =>
      (u % 2 == 1, c == 1) }.view.mapValues(_.size).toMap
    val a = cells.getOrElse((true, true), 0).toDouble
    val b = cells.getOrElse((true, false), 0).toDouble
    val c = cells.getOrElse((false, true), 0).toDouble
    val dd = cells.getOrElse((false, false), 0).toDouble
    val or = a * dd / (b * c)
    val hw = 1.96 * math.sqrt(1 / a + 1 / b + 1 / c + 1 / dd)
    val row = q("ab_odds_ratio").head()
    assert(row.getAs[Long]("a") == a.toLong)
    assert(row.getAs[Long]("d") == dd.toLong)
    assert(math.abs(row.getAs[Double]("odds_ratio") - or) < 1e-3)
    assert(math.abs(row.getAs[Double]("ci_lo") -
      math.exp(math.log(or) - hw)) < 1e-3)
    assert(math.abs(row.getAs[Double]("ci_hi") -
      math.exp(math.log(or) + hw)) < 1e-3)
  }

  test("ab_cohens_d matches a direct pooled-SD effect recomputation") {
    val pu = centsByUser.toArray.map { case (u, c) =>
      (u % 2, c.toDouble) }
    val g0 = pu.filter(_._1 == 0L).map(_._2)
    val g1 = pu.filter(_._1 == 1L).map(_._2)
    val m0 = g0.sum / g0.length; val m1 = g1.sum / g1.length
    val ss0 = g0.map(x => (x - m0) * (x - m0)).sum
    val ss1 = g1.map(x => (x - m1) * (x - m1)).sum
    val sp = math.sqrt((ss0 + ss1) / (g0.length + g1.length - 2))
    val dEff = (m1 - m0) / sp
    val gEff = dEff *
      (1.0 - 3.0 / (4.0 * (g0.length + g1.length) - 9.0))
    val row = q("ab_cohens_d").head()
    assert(row.getAs[Long]("n0") == g0.length)
    assert(math.abs(row.getAs[Double]("mean_diff") -
      (m1 - m0) / 100.0) < 1e-3)
    assert(math.abs(row.getAs[Double]("cohens_d") - dEff) < 1e-3)
    assert(math.abs(row.getAs[Double]("hedges_g") - gEff) < 1e-3)
  }
}
