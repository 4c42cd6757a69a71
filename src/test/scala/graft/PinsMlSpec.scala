package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, ML-metrics family — brute-force
  * textbook recomputations over raw sf0.001 rows (see PinsAbSpec for
  * the discipline). The histogram/window algebra the operators use at
  * scale is deliberately NOT reused: ranks come from explicit sorts,
  * AUC/AP from per-item loops, contingency stats from cell loops.
  */
class PinsMlSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  /** (doc_id, lang, n_chars, text) raw document rows. */
  private lazy val docs: Array[(Long, String, Long, String)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3)))

  /** (custkey, cents, year-month-day, status, priority, price). */
  private lazy val ord: Array[(Long, Long, java.time.LocalDate, String,
      String, Double)] =
    Tables.orders(spark, sf)
      .select(col("o_custkey"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"),
        col("o_orderdate").cast("date"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate,
        r.getString(3), r.getString(4), r.getDouble(5)))

  // ---- shared document-score helpers -------------------------------
  private lazy val np = docs.count(_._2 == "en")
  private lazy val nn = docs.length - np

  /** ascending-score midrank of each doc (ties averaged). */
  private def midranks(xs: Array[Long]): Array[Double] = {
    val sortedIdx = xs.zipWithIndex.sortBy(_._1)
    val out = new Array[Double](xs.length)
    var i = 0
    while (i < sortedIdx.length) {
      var j = i
      while (j < sortedIdx.length &&
        sortedIdx(j)._1 == sortedIdx(i)._1) j += 1
      val avg = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1..j
      for (k <- i until j) out(sortedIdx(k)._2) = avg
      i = j
    }
    out
  }

  test("ml_auc_roc matches a direct midrank AUC recomputation") {
    val r = midranks(docs.map(_._3))
    val rPos = docs.zipWithIndex.collect {
      case ((_, "en", _, _), i) => r(i) }.sum
    val auc = (rPos - np.toDouble * (np + 1) / 2) /
      (np.toDouble * nn)
    val row = q("ml_auc_roc").head()
    assert(row.getAs[Long]("n_pos") == np)
    assert(row.getAs[Long]("n_neg") == nn)
    assert(math.abs(row.getAs[Double]("auc") - auc) < 1e-3)
  }

  test("ml_lift_table matches a direct descending-score decile walk") {
    val n = docs.length
    val p = np
    val ranked = docs.sortBy(x => (-x._3, x._1))
    val byDecile = ranked.zipWithIndex.groupBy {
      case (_, i) => i * 10 / n + 1 }
    val rows = q("ml_lift_table").collect()
    assert(rows.length == byDecile.size)
    for (r <- rows) {
      val dec = r.getAs[Int]("decile")
      val g = byDecile(dec)
      val nD = g.length
      val posD = g.count(_._1._2 == "en")
      assert(r.getAs[Long]("n_d") == nD)
      assert(r.getAs[Long]("pos_d") == posD)
      assert(math.abs(r.getAs[Double]("lift") -
        (posD.toDouble / nD) / (p.toDouble / n)) < 1e-3)
      val cumPos = byDecile.filter(_._1 <= dec).values
        .map(_.count(_._1._2 == "en")).sum
      assert(math.abs(r.getAs[Double]("cum_gain") -
        cumPos.toDouble / p) < 1e-3)
    }
  }

  test("ml_ks_statistic matches a direct CDF-gap scan") {
    val scores = docs.map(_._3).distinct.sorted
    val gaps = scores.map { t =>
      val cp = docs.count(x => x._2 == "en" && x._3 <= t)
      val cn = docs.count(x => x._2 != "en" && x._3 <= t)
      (t, math.abs(cp.toDouble / np - cn.toDouble / nn))
    }
    val ksMax = gaps.map(_._2).max
    val atScore = gaps.filter(g => math.abs(g._2 - ksMax) < 1e-12)
      .map(_._1).min
    val row = q("ml_ks_statistic").head()
    assert(row.getAs[Long]("ks_at_score") == atScore)
    assert(row.getAs[Long]("n_pos") == np)
    assert(math.abs(row.getAs[Double]("ks") - ksMax) < 1e-3)
  }

  test("ml_cost_threshold matches a direct cost scan") {
    val scores = docs.map(_._3).distinct.sorted
    val costs = scores.map { t =>
      // policy: keep (positive) iff score > t
      val fn = docs.count(x => x._2 == "en" && x._3 <= t)
      val fp = docs.count(x => x._2 != "en" && x._3 > t)
      (t, fp * 1L + fn * 5L)
    }
    val best = costs.map(_._2).min
    val at = costs.filter(_._2 == best).map(_._1).min
    val row = q("ml_cost_threshold").head()
    assert(row.getAs[Long]("threshold") == at)
    assert(row.getAs[Long]("cost") == best)
    assert(row.getAs[Long]("cost_reject_all") == np * 5L)
    assert(row.getAs[Long]("cost_accept_all") == nn.toLong)
  }

  test("ml_pr_auc matches a direct average-precision walk") {
    val byScore = docs.groupBy(_._3).toArray.sortBy(-_._1)
    var cumC = 0L; var cumP = 0L; var ap = 0.0
    for ((_, g) <- byScore) {
      cumC += g.length
      val cp = g.count(_._2 == "en")
      cumP += cp
      if (cp > 0)
        ap += (cp.toDouble / np) * (cumP.toDouble / cumC)
    }
    val row = q("ml_pr_auc").head()
    assert(row.getAs[Long]("n_pos") == np)
    assert(row.getAs[Long]("n_rows") == docs.length)
    assert(math.abs(row.getAs[Double]("pr_auc") - ap) < 1e-3)
  }

  test("ml_woe_iv matches a direct WOE/IV recomputation") {
    val banded = ord.map(x =>
      (math.min(x._2 / 10000000L, 4L), x._5 == "1-URGENT"))
    val tp = banded.count(_._2).toDouble
    val tn = banded.length - tp
    val rows = q("ml_woe_iv").collect()
    var iv = 0.0
    val expected = banded.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (band, xs) =>
        val pos = xs.count(_._2).toDouble
        val neg = xs.length - pos
        val woe = if (pos > 0 && neg > 0)
          Some(math.log((pos * tn) / (neg * tp))) else None
        woe.foreach(w => iv += (pos / tp - neg / tn) * w)
        (band, xs.length, pos.toLong, woe)
    }
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (band, n, pos, woe)) =>
      assert(r.getAs[Long]("band") == band)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("pos") == pos)
      woe match {
        case Some(w) =>
          assert(math.abs(r.getAs[Double]("woe") - w) < 1e-3)
        case None => assert(r.isNullAt(r.fieldIndex("woe")))
      }
      assert(math.abs(r.getAs[Double]("iv") - iv) < 1e-3)
    }
  }

  test("ml_mcnemar matches the continuity-corrected statistic") {
    val b = ord.count(x => (x._6 > 150000.0) == (x._4 == "F") &&
      Set("1-URGENT", "2-HIGH")(x._5) != (x._4 == "F"))
    val c = ord.count(x => (x._6 > 150000.0) != (x._4 == "F") &&
      Set("1-URGENT", "2-HIGH")(x._5) == (x._4 == "F"))
    val num = math.max(math.abs(b - c) - 1, 0).toDouble
    val chi2 = num * num / (b + c)
    val row = q("ml_mcnemar").head()
    assert(row.getAs[Long]("b") == b && row.getAs[Long]("c") == c)
    assert(row.getAs[Long]("n_disagree") == b + c)
    assert(math.abs(row.getAs[Double]("chi2_cc") - chi2) < 1e-3)
    assert(row.getAs[Boolean]("significant_05") ==
      (num * num * 1000 > 3841.0 * (b + c)))
  }

  test("ml_brier_decomposition matches the Murphy decomposition") {
    val scored = ord.map(x => (math.min(x._2 / 4000000L, 9L), x._2,
      if (x._4 == "F") 1.0 else 0.0))
    val n = scored.length.toDouble
    val base = scored.map(_._3).sum / n
    var rel = 0.0; var res = 0.0
    for ((_, g) <- scored.groupBy(_._1)) {
      val nk = g.length.toDouble
      val pbar = math.min(0.95,
        g.map(_._2.toDouble).sum / (nk * 40000000.0))
      val ybar = g.map(_._3).sum / nk
      rel += nk * (pbar - ybar) * (pbar - ybar)
      res += nk * (ybar - base) * (ybar - base)
    }
    val row = q("ml_brier_decomposition").head()
    assert(row.getAs[Long]("n") == scored.length)
    assert(math.abs(row.getAs[Double]("reliability") - rel / n) < 1e-3)
    assert(math.abs(row.getAs[Double]("resolution") - res / n) < 1e-3)
    assert(math.abs(row.getAs[Double]("uncertainty") -
      base * (1 - base)) < 1e-3)
  }

  /** The three stacked categorical features the screen keys share. */
  private lazy val featureRows: Seq[(String, String, Boolean,
      Boolean)] =
    ord.toSeq.flatMap { x =>
      val isBase = x._3.isBefore(java.time.LocalDate
        .parse("1996-07-01"))
      val label = x._6 > 150000.0
      Seq(
        ("price_bin", math.min(math.floor(x._6 / 60000.0), 9.0)
          .toInt.toString, isBase, label),
        ("priority", x._5, isBase, label),
        ("status", x._4, isBase, label))
    }

  test("ml_psi_features matches a direct smoothed-PSI recomputation") {
    val rows = q("ml_psi_features").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val f = r.getAs[String]("feature")
      val cells = featureRows.filter(_._1 == f)
        .groupBy(_._2).view.mapValues { xs =>
          (xs.count(_._3), xs.count(!_._3)) }.toMap
      val nb = cells.size
      val sb = cells.values.map(_._1).sum
      val sc = cells.values.map(_._2).sum
      val psi = cells.values.map { case (b, c) =>
        val p = (b + 1).toDouble / (sb + nb)
        val qq = (c + 1).toDouble / (sc + nb)
        (p - qq) * math.log(p / qq)
      }.sum
      assert(r.getAs[Long]("n_buckets") == nb)
      assert(math.abs(r.getAs[Double]("psi") - psi) < 1e-3)
      assert(r.getAs[Boolean]("drifted_02") ==
        (r.getAs[Double]("psi") > 0.2))
    }
  }

  test("ml_chi2_select matches a direct contingency chi2 per feature") {
    val rows = q("ml_chi2_select").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val f = r.getAs[String]("feature")
      val vals: Seq[(String, Boolean)] = f match {
        case "month" => ord.toSeq.map(x =>
          (x._3.getMonthValue.toString, x._6 > 150000.0))
        case "priority" => ord.toSeq.map(x => (x._5, x._6 > 150000.0))
        case "status" => ord.toSeq.map(x => (x._4, x._6 > 150000.0))
        case other => fail(s"unexpected feature $other")
      }
      val n = vals.size.toDouble
      val c1 = vals.count(_._2).toDouble
      val c0 = n - c1
      val chi2 = vals.groupBy(_._1).values.map { xs =>
        val n1 = xs.count(_._2).toDouble
        val n0 = xs.size - n1
        val e1 = c1 * xs.size / n
        val e0 = c0 * xs.size / n
        (n1 - e1) * (n1 - e1) / e1 + (n0 - e0) * (n0 - e0) / e0
      }.sum
      val k = vals.map(_._1).distinct.size
      assert(r.getAs[Long]("n_values") == k)
      assert(r.getAs[Long]("df") == k - 1)
      assert(math.abs(r.getAs[Double]("chi2") - chi2) < 1e-2)
      assert(math.abs(r.getAs[Double]("cramers_v") -
        math.sqrt(chi2 / n)) < 1e-3)
    }
  }

  test("ml_info_gain matches a direct entropy recomputation") {
    def h2(a: Double, b: Double): Double = {
      val n = a + b
      (if (a > 0) -(a / n) * math.log(a / n) / math.log(2) else 0.0) +
        (if (b > 0) -(b / n) * math.log(b / n) / math.log(2) else 0.0)
    }
    val rows = q("ml_info_gain").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val f = r.getAs[String]("feature")
      val vals: Seq[(String, Boolean)] = f match {
        case "month" => ord.toSeq.map(x =>
          (x._3.getMonthValue.toString, x._6 > 150000.0))
        case "priority" => ord.toSeq.map(x => (x._5, x._6 > 150000.0))
        case "status" => ord.toSeq.map(x => (x._4, x._6 > 150000.0))
        case other => fail(s"unexpected feature $other")
      }
      val n = vals.size.toDouble
      val hy = h2(vals.count(_._2).toDouble, vals.count(!_._2))
      val groups = vals.groupBy(_._1).values
      val hcond = groups.map { xs =>
        (xs.size / n) * h2(xs.count(_._2).toDouble, xs.count(!_._2))
      }.sum
      val si = groups.map { xs =>
        -(xs.size / n) * math.log(xs.size / n) / math.log(2) }.sum
      assert(math.abs(r.getAs[Double]("info_gain") - (hy - hcond))
        < 1e-3)
      assert(math.abs(r.getAs[Double]("split_info") - si) < 1e-3)
      assert(math.abs(r.getAs[Double]("gain_ratio") -
        (hy - hcond) / si) < 1e-3)
    }
  }

  test("ml_minmax_scale matches a direct per-segment rescale") {
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySeg = cust.groupBy(_._2).view
      .mapValues(xs => (xs.map(_._3).min, xs.map(_._3).max)).toMap
    val rows = q("ml_minmax_scale").collect()
    assert(rows.length == cust.length)
    val expect = cust.map(x => x._1 -> x).toMap
    for (r <- rows) {
      val (ck, seg, cents) = expect(r.getAs[Long]("c_custkey"))
      assert(r.getAs[String]("seg") == seg)
      assert(math.abs(r.getAs[Double]("balance") - cents / 100.0)
        < 1e-9)
      val (lo, hi) = bySeg(seg)
      if (hi > lo)
        assert(math.abs(r.getAs[Double]("scaled") -
          (cents - lo).toDouble / (hi - lo)) < 1e-3, s"custkey $ck")
      else assert(r.isNullAt(r.fieldIndex("scaled")))
    }
  }

  test("ml_spearman_corr matches rank-Pearson per group") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity").cast("double"),
        col("l_extendedprice").cast("double"))
      .collect().map(r => (r.getString(0), r.getDouble(1),
        r.getDouble(2)))
    def pearson(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length
      val ma = a.sum / n; val mb = b.sum / n
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val va = a.map(x => (x - ma) * (x - ma)).sum
      val vb = b.map(x => (x - mb) * (x - mb)).sum
      cov / math.sqrt(va * vb)
    }
    def rankOf(xs: Array[Double]): Array[Double] = {
      val m = midranks(xs.map(x => math.round(x * 100)))
      m
    }
    val rows = q("ml_spearman_corr").collect()
    val byG = li.groupBy(_._1)
    assert(rows.length == byG.size)
    for (r <- rows) {
      val g = byG(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("n") == g.length)
      val rho = pearson(rankOf(g.map(_._2)), rankOf(g.map(_._3)))
      assert(math.abs(r.getAs[Double]("spearman_rho") - rho) < 1e-3)
    }
  }

  test("ml_kendall_tau matches a contingency tau-b recomputation") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long"),
        expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cells = li.groupBy(identity).view.mapValues(_.length.toLong)
      .toArray.map { case ((x, y), c) => (x, y, c) }
    var conc = 0.0; var disc = 0.0
    for ((ax, ay, an) <- cells; (bx, by, bn) <- cells) {
      if (bx > ax && by > ay) conc += an.toDouble * bn
      if (bx > ax && by < ay) disc += an.toDouble * bn
    }
    val n = li.length.toDouble
    val half = n * (n - 1) / 2
    val tieX = cells.groupBy(_._1).values
      .map(g => { val rn = g.map(_._3).sum.toDouble; rn * (rn - 1) / 2 })
      .sum
    val tieY = cells.groupBy(_._2).values
      .map(g => { val cn = g.map(_._3).sum.toDouble; cn * (cn - 1) / 2 })
      .sum
    val tau = (conc - disc) /
      math.sqrt((half - tieX) * (half - tieY))
    val row = q("ml_kendall_tau").head()
    assert(row.getAs[Long]("n") == li.length)
    assert(row.getAs[Long]("concordant") == conc.toLong)
    assert(row.getAs[Long]("discordant") == disc.toLong)
    assert(math.abs(row.getAs[Double]("tau_b") - tau) < 1e-3)
  }

  test("quality_kappa matches the textbook two-rater kappa") {
    val per = docs.map { case (_, _, nc, text) =>
      val letters = text.count(ch =>
        (ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z')).toLong
      (nc, letters, text.length.toLong)
    }
    val n = per.length.toDouble
    val sumChars = per.map(_._1).sum.toDouble
    val sumLetters = per.map(_._2).sum.toDouble
    val sumTl = per.map(_._3).sum.toDouble
    val votes = per.map { case (nc, lt, tl) =>
      (nc * n > sumChars, lt * sumTl > tl * sumLetters) }
    val n11 = votes.count(v => v._1 && v._2).toDouble
    val n10 = votes.count(v => v._1 && !v._2).toDouble
    val n01 = votes.count(v => !v._1 && v._2).toDouble
    val n00 = votes.count(v => !v._1 && !v._2).toDouble
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) /
      (n * n)
    val kappa = (po - pe) / (1 - pe)
    val row = q("quality_kappa").head()
    assert(row.getAs[Long]("n11") == n11.toLong)
    assert(row.getAs[Long]("n00") == n00.toLong)
    assert(math.abs(row.getAs[Double]("kappa") - kappa) < 1e-3)
  }
}
