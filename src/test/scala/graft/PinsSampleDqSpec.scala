package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 first-principles pins for the survey-sampling estimators
  * and the statistic-bearing dq_ keys (the r11 verdict's remaining
  * shared-formula gaps). Discipline as in PinsAbSpec: every statistic
  * is rebuilt from raw sf0.001 rows in plain Scala — never through the
  * query's own algebra — so a formula error shared by the Spark side
  * and its oracle SQL cannot hide behind the parity gate.
  */
class PinsSampleDqSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** First 8 hex chars of md5 as an unsigned long — the repo's
    * deterministic sampling draw (conv(substring(md5(s),1,8),16,10)). */
  private def md5b(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  private def cents(price: Double): Long =
    (BigDecimal(price).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      * 100).toLongExact

  /** Linear-interpolation percentile (Spark `percentile` /
    * DuckDB `quantile_cont`). */
  private def pctl(xs: Array[Double], p: Double): Double = {
    val s = xs.sorted
    val h = (s.length - 1) * p
    val lo = h.toInt
    if (lo + 1 >= s.length) s(lo)
    else s(lo) + (h - lo) * (s(lo + 1) - s(lo))
  }

  test("sample_neyman matches a direct N_h·sigma_h allocation") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byLang = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val w = byLang.map { case (lang, xs) =>
      val n = xs.length.toLong
      val s1 = xs.sum
      val s2 = xs.map(x => x * x).sum
      val sigma = math.sqrt(
        (s2.toDouble - s1.toDouble * s1 / n) / (n - 1))
      val wH = BigDecimal(n * sigma)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      (lang, (n, sigma, wH))
    }
    val wSum = w.values.map(_._3).sum
    val rows = q("sample_neyman").collect()
    assert(rows.length == w.size)
    for (r <- rows) {
      val (n, sigma, wH) = w(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_h") == n)
      assert(math.abs(r.getAs[Double]("sigma") - sigma) < 1e-3)
      val alloc =
        math.floor(100 * (wH.toDouble / wSum.toDouble)).toLong
      assert(r.getAs[Long]("alloc") == alloc)
    }
  }

  test("sample_ht_total matches a direct sum(y/pi) expansion") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1).substring(0, 1).toLong,
        cents(r.getDouble(2))))
    val rows = q("sample_ht_total").collect()
    val byStr = o.groupBy(_._2)
    assert(rows.length == byStr.size)
    for (r <- rows) {
      val st = r.getAs[Long]("stratum")
      val g = byStr(st)
      val sampled = g.filter(t => md5b(t._1.toString) % 100 < st * 10)
      val trueC = g.map(_._3).sum
      val sC = sampled.map(_._3).sum
      // half-up div: (s*20 + st) div (2*st) == round(s*10/st)
      val ht = (BigInt(sC) * 20 + st) / (2 * st)
      assert(r.getAs[Long]("n_pop") == g.length)
      assert(r.getAs[Long]("n_sampled") == sampled.length)
      assert(r.getAs[Long]("true_cents") == trueC)
      assert(BigInt(r.getAs[Long]("ht_est_cents")) == ht)
      val relErr = ((2 * (ht - trueC).abs * 1000000 + trueC) /
        (2 * BigInt(trueC))).toDouble / 10000.0
      assert(r.getAs[Double]("rel_err_pct") == relErr)
    }
  }

  test("sample_ratio_estimator matches direct ratio + expansion forms") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_quantity").cast("long"))
      .collect()
      .map(r => (md5b(s"${r.getLong(0)}-${r.get(1)}") % 100,
        cents(r.getDouble(2)), r.getLong(3)))
    val row = q("sample_ratio_estimator").collect().head
    val trueC = li.map(_._2).sum
    val xTot = li.map(_._3).sum
    val samp = li.filter(_._1 < 10)
    val sy = samp.map(_._2).sum
    val sx = samp.map(_._3).sum
    val ratio = (2 * BigInt(xTot) * sy + sx) / (2 * BigInt(sx))
    val expn = BigInt(sy) * 10
    assert(row.getAs[Long]("n_pop") == li.length)
    assert(row.getAs[Long]("n_sampled") == samp.length)
    assert(row.getAs[Long]("true_cents") == trueC)
    assert(BigInt(row.getAs[Long]("ratio_est_cents")) == ratio)
    assert(BigInt(row.getAs[Long]("expansion_est_cents")) == expn)
    def relErr(est: BigInt) =
      ((2 * (est - trueC).abs * 1000000 + trueC) /
        (2 * BigInt(trueC))).toDouble / 10000.0
    assert(row.getAs[Double]("rel_err_ratio_pct") == relErr(ratio))
    assert(row.getAs[Double]("rel_err_expansion_pct") == relErr(expn))
  }

  test("sample_bootstrap_ci matches a direct Poisson-weight replay") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    // inverse-CDF Poisson(1) thresholds, as declared in the query
    val thr = Array(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183)
    val means = (0 until 32).map { r =>
      var swv = BigDecimal(0); var sw = 0L
      for ((k, v) <- o) {
        val u = md5b(s"$k:$r").toDouble / 4294967296.0
        val w = thr.indexWhere(u < _) match {
          case -1 => 6
          case i => i
        }
        swv += v * w; sw += w
      }
      swv.toDouble / sw
    }.sorted
    val row = q("sample_bootstrap_ci").collect().head
    assert(row.getAs[Long]("n_rows") == o.length)
    assert(row.getAs[Long]("n_replicates") == 32)
    val meanFull = o.map(_._2).sum.toDouble / o.length
    assert(math.abs(row.getAs[Double]("mean_full") - meanFull) < 1e-3)
    assert(math.abs(row.getAs[Double]("ci_lo") - means(1)) < 1e-3)
    assert(math.abs(row.getAs[Double]("ci_hi") - means(30)) < 1e-3)
    assert(means(1) < means(30))
  }

  test("sample_block_bootstrap matches a direct 7-day-block draw") {
    val daily = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date").cast("string"),
        col("o_totalprice"))
      .collect().map(r => (r.getString(0), cents(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val epoch0 = java.time.LocalDate.parse("1990-01-01").toEpochDay
    val byBlock = daily.groupBy { case (day, _) =>
      (java.time.LocalDate.parse(day).toEpochDay - epoch0) / 7
    }
    val kept = byBlock.filter(b => md5b(b._1.toString) % 10 < 3)
    val rows = q("sample_block_bootstrap").collect()
    assert(rows.length == kept.size)
    for (r <- rows) {
      val g = kept(r.getAs[Long]("block"))
      assert(r.getAs[Long]("n_days") == g.size)
      assert(r.getAs[java.sql.Date]("first_day").toString ==
        g.keys.min)
      assert(r.getAs[java.sql.Date]("last_day").toString == g.keys.max)
      val rev = g.values.map(c => BigDecimal(c) / 100).sum.toDouble
      assert(math.abs(r.getAs[Double]("revenue") - rev) < 1e-2)
    }
  }

  test("mix_kl_divergence matches a direct sum p*ln(p*S) recomputation") {
    val srcs = Tables.documents(spark, sf).select(col("source"))
      .collect().map(_.getString(0))
    val counts = srcs.groupBy(identity).view.mapValues(_.length).toMap
    val nn = srcs.length
    val k = counts.size
    val contribs = counts.map { case (src, n) =>
      val p = n.toDouble / nn
      (src, BigDecimal(p * math.log(p * k))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP))
    }
    val kl = contribs.values.sum.toDouble
    val rows = q("mix_kl_divergence").collect()
    assert(rows.length == counts.size)
    for (r <- rows) {
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_docs") == counts(src))
      val share = ((counts(src).toLong * 10000 + nn / 2) / nn) / 10000.0
      assert(r.getAs[Double]("share") == share)
      assert(math.abs(r.getAs[Double]("contribution") -
        contribs(src).toDouble) < 1e-5)
      assert(math.abs(r.getAs[Double]("kl_nats") - kl) < 1e-5)
    }
    // KL(p‖uniform) is non-negative by Gibbs' inequality
    assert(rows.head.getAs[Double]("kl_nats") >= 0.0)
  }

  test("mix_curriculum matches a direct phase/md5-order numbering") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = docs
      .map { case (id, nc) => (id, math.min(nc / 200, 9L).toInt) }
      .groupBy(_._2).toSeq.flatMap { case (phase, g) =>
        g.map(_._1).sortBy(id => (md5hex(id.toString), id))
          .zipWithIndex
          .map { case (id, i) => (id, phase, i + 1) }
      }.toSet
    val rows = q("mix_curriculum").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("phase"),
        r.getAs[Int]("pos"))).toSet
    assert(rows == expected)
  }

  test("dq_capture_recapture matches a direct Chapman estimate") {
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"))
      .collect().map(r => (r.getLong(0), md5b(r.getLong(1).toString) % 100))
    val byCust = o.groupBy(_._1)
    val n1 = byCust.count(_._2.exists(_._2 < 5))
    val n2 = byCust.count(_._2.exists(t => t._2 >= 5 && t._2 < 10))
    val m = byCust.count(g =>
      g._2.exists(_._2 < 5) && g._2.exists(t => t._2 >= 5 && t._2 < 10))
    val est = (2 * BigInt(n1 + 1) * (n2 + 1) + (m + 1)) /
      (2 * BigInt(m + 1)) - 1
    val row = q("dq_capture_recapture").collect().head
    assert(row.getAs[Long]("n_true") == byCust.size)
    assert(row.getAs[Long]("n_capture1") == n1)
    assert(row.getAs[Long]("n_capture2") == n2)
    assert(row.getAs[Long]("n_both") == m)
    assert(BigInt(row.getAs[Long]("chapman_estimate")) == est)
    val nTrue = byCust.size
    val relErr = ((2 * (est - nTrue).abs * 1000000 + nTrue) /
      (2 * BigInt(nTrue))).toDouble / 10000.0
    assert(row.getAs[Double]("rel_err_pct") == relErr)
  }

  test("dq_drift_psi matches a direct smoothed per-bin PSI") {
    val cut = java.time.LocalDateTime.parse("1996-07-01T00:00:00")
    val o = Tables.orders(spark, sf)
      .select(col("o_orderdate"), col("o_totalprice"))
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).isBefore(cut),
        math.min(math.floor(r.getDouble(1) / 60000.0), 9.0).toInt))
    val bins = o.groupBy(_._2).view.mapValues { g =>
      (g.count(_._1).toLong, g.count(!_._1).toLong)
    }.toMap
    val tb = bins.values.map(_._1).sum
    val tc = bins.values.map(_._2).sum
    val terms = bins.map { case (bin, (nb, nc)) =>
      val p = (nb + 1).toDouble / (tb + 10)
      val qq = (nc + 1).toDouble / (tc + 10)
      (bin, BigDecimal((p - qq) * math.log(p / qq))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    val total = terms.values.sum.toDouble
    val rows = q("dq_drift_psi").collect()
    assert(rows.length == bins.size)
    for (r <- rows) {
      val bin = r.getAs[Int]("bin")
      assert(r.getAs[Long]("n_base") == bins(bin)._1)
      assert(r.getAs[Long]("n_comp") == bins(bin)._2)
      assert(math.abs(r.getAs[Double]("psi_term") -
        terms(bin).toDouble) < 1e-5)
      assert(math.abs(r.getAs[Double]("psi_total") - total) < 1e-5)
    }
    // PSI is a sum of (p-q)ln(p/q) terms, each non-negative
    assert(terms.values.forall(_ >= -1e-12))
  }

  test("dq_drift_chi2 matches a direct pooled-expectation Pearson chi2") {
    val o = Tables.orders(spark, sf)
      .select((year(col("o_orderdate")) * 100 +
        month(col("o_orderdate"))).cast("int"),
        col("o_orderpriority"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val cell = o.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val mt = o.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val pool = o.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val t = o.length.toLong
    val chi2 = mt.keys.map { ym =>
      val s = pool.keys.map { prio =>
        val obs = cell.getOrElse((ym, prio), 0L)
        if (obs == 0L) BigDecimal(0) // absent cells contribute no row
        else {
          val num = (obs * t - pool(prio) * mt(ym)).toDouble
          BigDecimal(num * num /
            (pool(prio).toDouble * mt(ym).toDouble * t.toDouble))
            .setScale(10, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum
      (ym, BigDecimal(s.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy { case (ym, c) => (-c, ym) }.take(5)
    val rows = q("dq_drift_chi2").collect()
      .map(r => (r.getAs[Int]("ym"), r.getAs[Double]("chi2")))
    assert(rows.length == chi2.length)
    for (((ymE, cE), (ymA, cA)) <- chi2.zip(rows)) {
      assert(ymA == ymE)
      assert(math.abs(cA - cE) < 1e-5)
    }
  }

  test("dq_outlier_mad matches a direct median/MAD recomputation") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val byStatus = o.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = q("dq_outlier_mad").collect()
    assert(rows.length == byStatus.size)
    for (r <- rows) {
      val xs = byStatus(r.getAs[String]("st")).toArray
      val med = BigDecimal(pctl(xs, 0.5))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val mad = BigDecimal(pctl(xs.map(x => math.abs(x - med)), 0.5))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val nOut = xs.count(x => math.abs(x - med) > mad * 5.0)
      assert(math.abs(r.getAs[Double]("med") - med) < 1e-9)
      assert(math.abs(r.getAs[Double]("mad") - mad) < 1e-9)
      assert(r.getAs[Long]("n") == xs.length)
      assert(r.getAs[Long]("n_outliers") == nOut)
    }
  }

  test("dq_order_concordance matches a direct adjacent-pair walk") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(_._4)
      s.zip(s.tail).map { case (a, b) =>
        (a._2, if (b._3 < a._3) 1L else 0L) // keyed by LEADING type
      }
    }.toSeq
    val byType = pairs.groupBy(_._1)
    val rows = q("dq_order_concordance").collect()
    assert(rows.length == byType.size)
    for (r <- rows) {
      val g = byType(r.getAs[String]("event_type"))
      val disc = g.map(_._2).sum
      assert(r.getAs[Long]("n_pairs") == g.length)
      assert(r.getAs[Long]("n_discordant") == disc)
      val rate = ((BigInt(disc) * 1000000 + g.length / 2) /
        BigInt(g.length)).toDouble / 1000000.0
      assert(r.getAs[Double]("discordance_rate") == rate)
    }
  }

  test("dq_float_drift matches a direct sequential-fold drift") {
    val o = Tables.orders(spark, sf)
      .select((year(col("o_orderdate")) * 100 +
        month(col("o_orderdate"))).cast("int"),
        col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val byYm = o.groupBy(_._1)
    val rows = q("dq_float_drift").collect()
    assert(rows.length == byYm.size)
    for (r <- rows) {
      val g = byYm(r.getAs[Int]("ym"))
      val exactCents = g.map(t => cents(t._3)).sum
      var naive = 0.0
      for ((_, _, v) <- g.sortBy(_._2)) naive += v
      val drift = (naive - exactCents.toDouble / 100.0) * 100.0
      assert(r.getAs[Long]("n_orders") == g.length)
      assert(math.abs(r.getAs[Double]("exact_total") -
        exactCents / 100.0) < 1e-6)
      assert(math.abs(r.getAs[Double]("drift_cents") - drift) < 1e-6)
    }
  }

  test("dq_round_number_bias matches direct cent-ending shares") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), cents(r.getDouble(1)) % 100))
    val byPrio = o.groupBy(_._1)
    val rows = q("dq_round_number_bias").collect()
    assert(rows.length == byPrio.size)
    for (r <- rows) {
      val g = byPrio(r.getAs[String]("prio"))
      val n = g.length.toLong
      val n00 = g.count(_._2 == 0L).toLong
      val n99 = g.count(_._2 == 99L).toLong
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("n_00") == n00)
      assert(r.getAs[Long]("n_99") == n99)
      assert(r.getAs[Double]("share_00") ==
        ((n00 * 10000 + n / 2) / n) / 10000.0)
      assert(r.getAs[Double]("share_99") ==
        ((n99 * 10000 + n / 2) / n) / 10000.0)
      assert(r.getAs[Boolean]("suspicious") ==
        (n00 * 100 > 3 * n || n99 * 100 > 3 * n))
    }
  }
}
