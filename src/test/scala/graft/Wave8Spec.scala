package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Driver-side recomputation pins for the round-10 wave-8..13
  * statistics (the dcba96d discipline): every formula is rebuilt from
  * first principles in plain Scala over collected sf0.001 data and
  * compared to the declared query's output. The Spark/DuckDB parity
  * gate only proves the ENGINES agree — these tests prove the agreed
  * number is the textbook statistic, so a formula edit that keeps
  * both engines in lockstep still fails CI. Tolerances are loose
  * (1e-3) on purpose: they target formula regressions, not rounding
  * spelling (the oracle gate owns digit-exact parity).
  */
class Wave8Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (priority digit, quantity) rows for the k-group tests. */
  private lazy val gq: Array[(Int, Int)] = {
    val li = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        expr("CAST(substring(o_orderpriority, 1, 1) AS INT)"),
        col("l_quantity").cast("int"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(li.nonEmpty)
    li
  }

  test("ab_kruskal_wallis matches a brute-force midrank recomputation") {
    val n = gq.length
    val byVal = gq.groupBy(_._2).view.mapValues(_.length).toMap
    val mid = {
      var cum = 0L
      byVal.toSeq.sortBy(_._1).map { case (v, t) =>
        val m = cum + (t + 1) / 2.0; cum += t; (v, m)
      }.toMap
    }
    val hTerm = (1 to 5).map { g =>
      val xs = gq.filter(_._1 == g)
      val r = xs.map(x => mid(x._2)).sum
      r * r / xs.length
    }.sum
    val h = 12.0 / (n.toDouble * (n + 1)) * hTerm - 3.0 * (n + 1)
    val ties = byVal.values.map(t => t.toDouble * t * t - t).sum
    val hAdj = h / (1.0 - ties / (n.toDouble * n * n - n))
    val row = q("ab_kruskal_wallis").head()
    assert(math.abs(row.getAs[Double]("h") - h) < 1e-3)
    assert(math.abs(row.getAs[Double]("h_tie_adj") - hAdj) < 1e-3)
  }

  test("ab_mood_median matches a direct above-pooled-median chi2") {
    val sorted = gq.map(_._2).sorted
    val n = sorted.length
    val med = (sorted((n - 1) / 2) + sorted(n / 2)) / 2.0
    val a = (1 to 5).map(g =>
      gq.count(x => x._1 == g && x._2 > med).toDouble)
    val ng = (1 to 5).map(g => gq.count(_._1 == g).toDouble)
    val bigA = a.sum; val bigB = n - bigA
    val chi2 = (1 to 5).map { i =>
      val d = a(i - 1) * n - ng(i - 1) * bigA
      d * d / ng(i - 1)
    }.sum / (bigA * bigB)
    val row = q("ab_mood_median").head()
    assert(math.abs(row.getAs[Double]("pooled_median") - med) < 1e-9)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-3)
  }

  test("ab_levene matches the direct Brown-Forsythe F") {
    val groups = (1 to 5).map(g => gq.filter(_._1 == g).map(_._2))
    val meds = groups.map { xs =>
      val s = xs.sorted; (s((s.length - 1) / 2) + s(s.length / 2)) / 2.0
    }
    val z = groups.zip(meds).map { case (xs, m) =>
      xs.map(x => math.abs(x - m))
    }
    val n = gq.length
    val zbar = z.flatten.sum / n
    val num = z.map(zs => zs.length *
      math.pow(zs.sum / zs.length - zbar, 2)).sum
    val den = z.map { zs =>
      val m = zs.sum / zs.length; zs.map(v => (v - m) * (v - m)).sum
    }.sum
    val f = (n - 5.0) / 4.0 * num / den
    val row = q("ab_levene").head()
    assert(math.abs(row.getAs[Double]("f_bf") - f) < 1e-3)
  }

  test("ab_jonckheere matches brute-force JT and the tie-corrected z") {
    val groups = (1 to 5).map(g => gq.filter(_._1 == g).map(_._2))
    var jt = 0.0
    for (i <- 0 until 5; j <- (i + 1) until 5) {
      val ci = groups(i).groupBy(identity).view.mapValues(_.length)
      for ((vj, cj) <- groups(j).groupBy(identity)
          .view.mapValues(_.length)) {
        jt += cj.toDouble * ci.filter(_._1 < vj).values.sum +
          0.5 * cj * ci.getOrElse(vj, 0)
      }
    }
    val n = gq.length.toDouble
    val ns = groups.map(_.length.toDouble)
    val tv = gq.groupBy(_._2).view.mapValues(_.length.toDouble).values
    val mu = (n * n - ns.map(x => x * x).sum) / 4.0
    val t1 = (n * (n - 1) * (2 * n + 5)
      - ns.map(x => x * (x - 1) * (2 * x + 5)).sum
      - tv.map(t => t * (t - 1) * (2 * t + 5)).sum) / 72.0
    val t2 = ns.map(x => x * (x - 1) * (x - 2)).sum *
      tv.map(t => t * (t - 1) * (t - 2)).sum /
      (36.0 * n * (n - 1) * (n - 2))
    val t3 = ns.map(x => x * (x - 1)).sum * tv.map(t => t * (t - 1)).sum /
      (8.0 * n * (n - 1))
    val z = (jt - mu) / math.sqrt(t1 + t2 + t3)
    val row = q("ab_jonckheere").head()
    assert(math.abs(row.getAs[Double]("jt") - jt) < 0.51)
    assert(math.abs(row.getAs[Double]("z") - z) < 1e-3)
  }

  test("ab_cliffs_delta matches a direct pair-count recomputation") {
    val rows = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_quantity").cast("int"), col("l_returnflag"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val xs = rows.filter(_._2 == "R").map(_._1)
    val ys = rows.filter(_._2 == "A").map(_._1)
    val cy = ys.groupBy(identity).view.mapValues(_.length).toMap
    var gt = 0L; var lt = 0L
    for ((v, c) <- xs.groupBy(identity).view.mapValues(_.length)) {
      gt += c.toLong * cy.filter(_._1 < v).values.sum
      lt += c.toLong * cy.filter(_._1 > v).values.sum
    }
    val delta = (gt - lt).toDouble / (xs.length.toLong * ys.length)
    val row = q("ab_cliffs_delta").head()
    assert(math.abs(row.getAs[Double]("delta") - delta) < 1e-5)
  }

  test("ab_welch_t matches the textbook t and Welch-Satterthwaite df") {
    val pu = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)"))
        .as("cents"))
      .select((col("user_id") % 2).as("arm"), col("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1).toDouble))
    def mv(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      (m, xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1))
    }
    val (m0, v0) = mv(pu.filter(_._1 == 0).map(_._2))
    val (m1, v1) = mv(pu.filter(_._1 == 1).map(_._2))
    val n0 = pu.count(_._1 == 0); val n1 = pu.count(_._1 == 1)
    val se2 = v1 / n1 + v0 / n0
    val t = (m1 - m0) / math.sqrt(se2)
    val df = se2 * se2 / (math.pow(v1 / n1, 2) / (n1 - 1)
      + math.pow(v0 / n0, 2) / (n0 - 1))
    val row = q("ab_welch_t").head()
    assert(math.abs(row.getAs[Double]("t_welch") - t) < 1e-3)
    assert(math.abs(row.getAs[Double]("df_welch") - df) < 0.1)
  }

  test("ab_hodges_lehmann matches the materialized pairwise median") {
    val rows = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_quantity").cast("int"), col("l_returnflag"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val ca = rows.filter(_._2 == "R").groupBy(_._1)
      .view.mapValues(_.length.toLong).toMap
    val cb = rows.filter(_._2 == "A").groupBy(_._1)
      .view.mapValues(_.length.toLong).toMap
    val dh = scala.collection.mutable.Map.empty[Int, Long]
    for ((va, na) <- ca; (vb, nb) <- cb)
      dh(va - vb) = dh.getOrElse(va - vb, 0L) + na * nb
    val total = dh.values.sum
    val k1 = (total + 1) / 2; val k2 = total / 2 + 1
    var cum = 0L; var x1 = Int.MinValue; var x2 = Int.MinValue
    for (d <- dh.keys.toSeq.sorted) {
      val prev = cum; cum += dh(d)
      if (prev < k1 && cum >= k1) x1 = d
      if (prev < k2 && cum >= k2) x2 = d
    }
    val row = q("ab_hodges_lehmann").head()
    assert(row.getAs[Double]("hl_shift") === (x1 + x2) / 2.0)
  }

  test("ml_fleiss_kappa matches the per-item P_i mean recomputation") {
    // rater 3 spelled directly: token proxy = #spaces + 1
    val votes = Tables.documents(spark, sf)
      .select(col("n_chars"), col("text")).collect().map { r =>
        val t = r.getString(1)
        (if (r.getLong(0) > 200) 1 else 0) +
          (if (t.contains(" the ")) 1 else 0) +
          (if (t.count(_ == ' ') + 1 > 30) 1 else 0)
      }
    val n = votes.length.toDouble
    val pBar = votes.map(v =>
      (v * (v - 1) + (3 - v) * (2 - v)) / 6.0).sum / n
    val pYes = votes.sum.toDouble / (3 * n)
    val pe = pYes * pYes + (1 - pYes) * (1 - pYes)
    val kappa = (pBar - pe) / (1 - pe)
    val row = q("ml_fleiss_kappa").head()
    assert(math.abs(row.getAs[Double]("kappa") - kappa) < 1e-3)
  }

  test("ml_adjusted_rand matches a pair-count ARI over the assignment") {
    val assigned = graft.engine.ml.Centroids
      .distToCentroids(Tables.embeddings(spark, sf))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("vec_id").orderBy(col("d2"), col("clabel"))))
      .filter(col("rk") === 1)
      .select("label", "clabel")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val n = assigned.length.toDouble
    def pairs(xs: Map[_, Int]) =
      xs.values.map(c => c.toDouble * (c - 1)).sum
    val sij = pairs(assigned.groupBy(identity).view.mapValues(_.length)
      .toMap)
    val sa = pairs(assigned.groupBy(_._1).view.mapValues(_.length).toMap)
    val sb = pairs(assigned.groupBy(_._2).view.mapValues(_.length).toMap)
    val t = n * (n - 1)
    val ari = 2.0 * (sij * t - sa * sb) / ((sa + sb) * t - 2 * sa * sb)
    val row = q("ml_adjusted_rand").head()
    assert(math.abs(row.getAs[Double]("adjusted_rand") - ari) < 1e-5)
  }

  test("profile_jarque_bera matches central moments from raw dollars") {
    val xs = Tables.orders(spark, sf)
      .select(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT) div 100"))
      .collect().map(_.getLong(0).toDouble)
    val n = xs.length
    val mu = xs.sum / n
    def m(k: Int) = xs.map(x => math.pow(x - mu, k)).sum / n
    val skew = m(3) / math.pow(m(2), 1.5)
    val exk = m(4) / (m(2) * m(2)) - 3.0
    val jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
    val row = q("profile_jarque_bera").head()
    assert(math.abs(row.getAs[Double]("skewness") - skew) < 1e-4)
    assert(math.abs(row.getAs[Double]("ex_kurtosis") - exk) < 1e-4)
    assert(math.abs(row.getAs[Double]("jb") - jb) < 1e-2)
  }

  test("ab_permutation_test matches a direct md5-bit re-randomization") {
    val users = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)"))
        .as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val s1 = users.filter(_._1 % 2 == 1).map(_._2)
    val s0 = users.filter(_._1 % 2 == 0).map(_._2)
    val dobs = math.abs(s1.sum.toDouble / s1.length
      - s0.sum.toDouble / s0.length)
    var valid = 0; var ge = 0
    for (b <- 0 until 64) {
      val (g1, g0) = users.partition { case (u, _) =>
        val h = md5hex(u.toString)
        val bit = if (b < 32)
          (java.lang.Long.parseLong(h.substring(0, 8), 16) >> b) & 1
        else
          (java.lang.Long.parseLong(h.substring(8, 16), 16) >>
            (b - 32)) & 1
        bit == 1
      }
      if (g1.nonEmpty && g0.nonEmpty) {
        valid += 1
        val d = math.abs(g1.map(_._2).sum.toDouble / g1.length
          - g0.map(_._2).sum.toDouble / g0.length)
        if (d >= dobs) ge += 1
      }
    }
    val p = (1.0 + ge) / (1.0 + valid)
    val row = q("ab_permutation_test").head()
    assert(row.getAs[Long]("n_permutations") === valid.toLong)
    assert(math.abs(row.getAs[Double]("p_value") - p) < 1e-5)
  }

  test("event_logrank matches the per-day hypergeometric recomputation") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        (unix_micros(col("ts")) / lit(86400000000L)).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val fc = ev.filter(_._2 == "click").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val fb = ev.filter(_._2 == "purchase").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val users = fc.toSeq.map { case (u, d0) =>
      (u % 2, fb.get(u).filter(_ >= d0).map(_ - d0))
    }
    val na1 = users.count(_._1 == 1); val na0 = users.count(_._1 == 0)
    val byDay = users.collect { case (a, Some(t)) => (t, a) }
      .groupBy(_._1).view.mapValues { xs =>
        (xs.count(_._2 == 1), xs.count(_._2 == 0))
      }.toSeq.sortBy(_._1)
    var p1 = 0; var p0 = 0; var o = 0.0; var e = 0.0; var v = 0.0
    for ((_, (d1, d0e)) <- byDay) {
      val n1 = na1 - p1; val n0 = na0 - p0
      val n = n1 + n0; val dd = d1 + d0e
      o += d1; e += dd.toDouble * n1 / n
      if (n >= 2)
        v += dd.toDouble * n1 * n0 * (n - dd) / (n.toDouble * n * (n - 1))
      p1 += d1; p0 += d0e
    }
    val chi2 = (o - e) * (o - e) / v
    val row = q("event_logrank").head()
    assert(row.getAs[Long]("observed_treat") === o.toLong)
    assert(math.abs(row.getAs[Double]("expected_treat") - e) < 1e-3)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-3)
  }

  test("ab_brunner_munzel matches the lawstat rank-form recomputation") {
    // Deliberately a DIFFERENT formula path than the query (combined
    // and within-group midranks instead of placement histograms):
    // W = n1·n2·(R̄2−R̄1) / (N·sqrt(n1·S1² + n2·S2²)) with
    // S_i² = Var(R_ik − R_ik^(i)). Equality pins the algebraic
    // identity the query's histogram form relies on.
    val rows = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_quantity").cast("int"), col("l_returnflag"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val xa = rows.filter(_._2 == "A").map(_._1.toDouble).sorted
    val xr = rows.filter(_._2 == "R").map(_._1.toDouble).sorted
    def midranks(xs: Array[Double], pool: Array[Double]) = {
      xs.map { x =>
        val lo = pool.indexWhere(_ >= x) match {
          case -1 => pool.length; case i => i
        }
        val hi = pool.lastIndexWhere(_ <= x) + 1
        lo + (hi - lo + 1) / 2.0
      }
    }
    val pool = (xa ++ xr).sorted
    val r1 = midranks(xa, pool); val r2 = midranks(xr, pool)
    val w1 = midranks(xa, xa); val w2 = midranks(xr, xr)
    val n1 = xa.length; val n2 = xr.length
    val m1 = r1.sum / n1; val m2 = r2.sum / n2
    val v1 = (0 until n1).map(i =>
      math.pow(r1(i) - w1(i) - m1 + (n1 + 1) / 2.0, 2)).sum / (n1 - 1)
    val v2 = (0 until n2).map(i =>
      math.pow(r2(i) - w2(i) - m2 + (n2 + 1) / 2.0, 2)).sum / (n2 - 1)
    val wStat = n1.toDouble * n2 * (m2 - m1) / (n1 + n2) /
      math.sqrt(n1 * v1 + n2 * v2)
    val pHat = (m2 - (n2 + 1) / 2.0) / n1
    val row = q("ab_brunner_munzel").head()
    assert(math.abs(row.getAs[Double]("w_bm") - wStat) < 1e-3)
    assert(math.abs(row.getAs[Double]("p_hat") - pHat) < 1e-5)
  }

  test("ab_anderson_darling matches the Pettitt position-sum form " +
      "and E[A2]~1 scaling") {
    // Different formula path: iterate pooled ORDER STATISTIC
    // positions j (expanding ties), not distinct values — equality
    // pins both the discrete collapse and the 1/(n1·n2)
    // normalization (a landing review caught an extra /N factor:
    // E[A²] must be ~1 under the null, not ~1/N).
    // micro-example, hand-computed: {1,2} vs {3,4} → positions j=1..3
    // give 4/3 + 4 + 4/3 = 20/3; A² = (20/3)/(2·2) = 5/3 (and the
    // buggy extra /N would report 5/12)
    def discreteA2(xs: Seq[(Int, Boolean)]): Double = {
      val n1 = xs.count(_._2); val n0 = xs.size - n1
      val nTot = xs.size
      val hist = xs.groupBy(_._1).view
        .mapValues(g => (g.count(_._2), g.size)).toSeq.sortBy(_._1)
      var c1 = 0L; var cm = 0L; var ts = 0.0
      for ((_, (t1, t)) <- hist) {
        c1 += t1; cm += t
        if (cm < nTot)
          ts += t * math.pow(c1.toDouble * nTot - cm.toDouble * n1, 2) /
            (cm.toDouble * (nTot - cm))
      }
      ts / (n1.toDouble * n0)
    }
    assert(math.abs(discreteA2(
      Seq((1, true), (2, true), (3, false), (4, false))) - 5.0 / 3) < 1e-12)
    val rows = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("R", "A"))
      .select(col("l_quantity").cast("int"), col("l_returnflag"))
      .collect().map(r => (r.getInt(0), r.getString(1) == "R")).toSeq
    val a2 = discreteA2(rows)
    val row = q("ab_anderson_darling").head()
    assert(math.abs(row.getAs[Double]("a2") - a2) < 1e-3)
    // null-ish fixture data: the correctly-normalized A² must be O(1),
    // not O(1/N)
    assert(row.getAs[Double]("a2") > 0.01)
  }

  test("time_durbin_watson matches the centered-residual recomputation") {
    val ys = Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(expr(
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))*100) AS BIGINT)")
        .as("y"))
      .orderBy("day").collect().map(_.getLong(1).toDouble)
    val mean = ys.sum / ys.length
    val e = ys.map(_ - mean)
    val dw = e.sliding(2).map(p => (p(1) - p(0)) * (p(1) - p(0))).sum /
      e.map(v => v * v).sum
    val row = q("time_durbin_watson").head()
    assert(math.abs(row.getAs[Double]("dw") - dw) < 1e-3)
  }
}
