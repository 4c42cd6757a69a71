package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, ML-metrics family part 2 —
  * classifier panels, association measures, calibration and OLS (see
  * PinsAbSpec for the discipline).
  */
class PinsMl2Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val docs: Array[(Long, String, String, Long, String)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getString(4)))

  private lazy val ord: Array[(String, String, Double,
      java.time.LocalDate)] =
    Tables.orders(spark, sf)
      .select(col("o_orderstatus"), col("o_orderpriority"),
        col("o_totalprice"), col("o_orderdate").cast("date"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDate(3).toLocalDate))

  private lazy val li: Array[(Double, Double, Double, Double)] =
    Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("double"),
        col("l_discount").cast("double"), col("l_tax").cast("double"),
        col("l_extendedprice").cast("double"))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3)))

  private def pearson(a: Seq[Double], b: Seq[Double]): Double = {
    val n = a.length
    val ma = a.sum / n; val mb = b.sum / n
    val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
    cov / math.sqrt(a.map(x => (x - ma) * (x - ma)).sum *
      b.map(x => (x - mb) * (x - mb)).sum)
  }

  test("ml_confusion_multi matches a direct 3-class panel") {
    val t = ord.map { x =>
      val truth = if (Set("1-URGENT", "2-HIGH")(x._2)) "high"
        else if (x._2 == "3-MEDIUM") "med" else "low"
      val pred = if (x._3 >= 150000.0) "high"
        else if (x._3 >= 60000.0) "med" else "low"
      (truth, pred)
    }
    val rows = q("ml_confusion_multi").collect()
    assert(rows.map(_.getAs[String]("cls")).toSeq ==
      Seq("high", "low", "med"))
    for (r <- rows) {
      val cls = r.getAs[String]("cls")
      val tp = t.count(x => x._1 == cls && x._2 == cls)
      val support = t.count(_._1 == cls)
      val predicted = t.count(_._2 == cls)
      assert(r.getAs[Long]("tp") == tp)
      assert(r.getAs[Long]("fn") == support - tp)
      assert(r.getAs[Long]("fp") == predicted - tp)
      val p = tp.toDouble / predicted
      val rec = tp.toDouble / support
      assert(math.abs(r.getAs[Double]("precision") - p) < 1e-3)
      assert(math.abs(r.getAs[Double]("recall") - rec) < 1e-3)
      assert(math.abs(r.getAs[Double]("f1") -
        2 * p * rec / (p + rec)) < 1e-3)
    }
  }

  test("ml_feature_vif matches direct Pearson r and VIF closed form") {
    val x = li.map(_._1).toSeq; val z = li.map(_._2).toSeq
    val w = li.map(_._3).toSeq
    val r12 = pearson(x, z); val r13 = pearson(x, w)
    val r23 = pearson(z, w)
    val det = 1 - r12 * r12 - r13 * r13 - r23 * r23 +
      2 * r12 * r13 * r23
    val row = q("ml_feature_vif").head()
    assert(row.getAs[Long]("n") == li.length)
    assert(math.abs(row.getAs[Double]("r_qty_disc") - r12) < 1e-3)
    assert(math.abs(row.getAs[Double]("r_qty_tax") - r13) < 1e-3)
    assert(math.abs(row.getAs[Double]("r_disc_tax") - r23) < 1e-3)
    assert(math.abs(row.getAs[Double]("vif_quantity") -
      (1 - r23 * r23) / det) < 1e-2)
    assert(math.abs(row.getAs[Double]("vif_tax") -
      (1 - r12 * r12) / det) < 1e-2)
  }

  /** The shared doc confidence score: min(n_chars,2000)*10000/2000,
    * floor-divided — exact integer per doc. */
  private def conf4(nChars: Long): Long =
    math.min(nChars, 2000L) * 10000 / 2000

  test("ml_expected_calibration_error matches a direct ECE") {
    val scored = docs.map(x => (math.min(conf4(x._4) / 1000, 9L),
      conf4(x._4), if (x._2 == "en") 1L else 0L))
    val n = scored.length
    val ece = scored.groupBy(_._1).values.map { g =>
      math.abs(g.map(_._3).sum * 10000.0 - g.map(_._2).sum)
    }.sum / (n * 10000.0)
    val rows = q("ml_expected_calibration_error").collect()
    for (r <- rows) {
      val bin = r.getAs[Long]("bin")
      val g = scored.filter(_._1 == bin)
      assert(r.getAs[Long]("n_b") == g.length)
      assert(math.abs(r.getAs[Double]("accuracy") -
        g.map(_._3).sum.toDouble / g.length) < 1e-3)
      assert(math.abs(r.getAs[Double]("mean_confidence") -
        g.map(_._2).sum.toDouble / g.length / 10000.0) < 1e-3)
      assert(math.abs(r.getAs[Double]("ece") - ece) < 1e-3)
    }
  }

  test("ml_cohen_kappa matches the textbook two-classifier kappa") {
    val votes = ord.map(x =>
      (x._3 > 150000.0, Set("1-URGENT", "2-HIGH")(x._2)))
    val n = votes.length.toDouble
    val p11 = votes.count(v => v._1 && v._2).toDouble
    val p10 = votes.count(v => v._1 && !v._2).toDouble
    val p01 = votes.count(v => !v._1 && v._2).toDouble
    val p00 = votes.count(v => !v._1 && !v._2).toDouble
    val po = (p11 + p00) / n
    val pe = ((p11 + p10) * (p11 + p01) + (p01 + p00) * (p10 + p00)) /
      (n * n)
    val row = q("ml_cohen_kappa").head()
    assert(row.getAs[Long]("n") == votes.length)
    assert(row.getAs[Long]("agree") == (p11 + p00).toLong)
    assert(math.abs(row.getAs[Double]("po") - po) < 1e-3)
    assert(math.abs(row.getAs[Double]("kappa") -
      (po - pe) / (1 - pe)) < 1e-3)
  }

  test("ml_matthews_corr matches the textbook MCC") {
    val votes = ord.map(x => (x._1 == "F", x._3 > 150000.0))
    val tp = votes.count(v => v._2 && v._1).toDouble
    val fp = votes.count(v => v._2 && !v._1).toDouble
    val fn = votes.count(v => !v._2 && v._1).toDouble
    val tn = votes.count(v => !v._2 && !v._1).toDouble
    val mcc = (tp * tn - fp * fn) /
      math.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    val row = q("ml_matthews_corr").head()
    assert(row.getAs[Long]("tp") == tp.toLong)
    assert(row.getAs[Long]("tn") == tn.toLong)
    assert(math.abs(row.getAs[Double]("mcc") - mcc) < 1e-3)
  }

  test("ml_cramers_v matches a full-domain chi2 recomputation") {
    val base = docs.filter(x => x._2 != null && x._3 != null)
      .map(x => (x._2, x._3))
    val n = base.length.toDouble
    val langs = base.map(_._1).distinct
    val srcs = base.map(_._2).distinct
    var chi2 = 0.0
    for (l <- langs; s0 <- srcs) {
      val o = base.count(x => x._1 == l && x._2 == s0).toDouble
      val e = base.count(_._1 == l).toDouble *
        base.count(_._2 == s0) / n
      chi2 += (o - e) * (o - e) / e
    }
    val df = math.min(langs.length, srcs.length) - 1
    val row = q("ml_cramers_v").head()
    assert(row.getAs[Long]("n") == base.length)
    assert(row.getAs[Long]("n_cells") == langs.length * srcs.length)
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-2)
    assert(math.abs(row.getAs[Double]("cramers_v") -
      math.sqrt(chi2 / (n * df))) < 1e-3)
  }

  test("ml_somers_d matches a direct pair count over pos x neg") {
    val pos = docs.filter(_._2 == "en").map(_._4)
    val neg = docs.filter(_._2 != "en").map(_._4)
    var conc = 0L; var disc = 0L; var tied = 0L
    for (p <- pos; g <- neg) {
      if (p > g) conc += 1
      else if (p < g) disc += 1
      else tied += 1
    }
    val d = (conc - disc).toDouble / (pos.length.toLong * neg.length)
    val row = q("ml_somers_d").head()
    assert(row.getAs[Long]("n_pos") == pos.length)
    assert(row.getAs[Double]("concordant") == conc.toDouble)
    assert(row.getAs[Double]("discordant") == disc.toDouble)
    assert(row.getAs[Double]("tied_score") == tied.toDouble)
    assert(math.abs(row.getAs[Double]("somers_d") - d) < 1e-3)
  }

  test("ml_log_loss matches a direct Laplace-smoothed holdout loss") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def trainSide(docId: Long): Boolean = {
      val hex = md.digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 2 == 0
    }
    val base = docs.map(x =>
      (x._3, if (x._2 == "en") 1 else 0, trainSide(x._1)))
    val bySrc = base.groupBy(_._1)
    var tsum = 0.0; var nTest = 0L; var kTest = 0L
    for ((_, g) <- bySrc) {
      val tr = g.filter(_._3); val te = g.filterNot(_._3)
      val p = (tr.map(_._2).sum + 1).toDouble / (tr.length + 2)
      val kTe = te.map(_._2).sum
      tsum += kTe * math.log(p) +
        (te.length - kTe) * math.log(1 - p)
      nTest += te.length; kTest += kTe
    }
    val gTr = base.filter(_._3)
    val p0 = (gTr.map(_._2).sum + 1).toDouble / (gTr.length + 2)
    val row = q("ml_log_loss").head()
    assert(row.getAs[Long]("n_train") == gTr.length)
    assert(row.getAs[Long]("n_test") == nTest)
    assert(math.abs(row.getAs[Double]("log_loss") - (-tsum / nTest))
      < 1e-3)
    assert(math.abs(row.getAs[Double]("log_loss_baseline") -
      (-(kTest * math.log(p0) + (nTest - kTest) * math.log(1 - p0))
        / nTest)) < 1e-3)
  }

  test("ml_uncertainty_coef matches direct entropy/MI recomputation") {
    val base = docs.filter(x => x._2 != null && x._3 != null)
      .map(x => (x._2, x._3))
    val n = base.length.toDouble
    def entropy[K](ks: Seq[K]): Double =
      ks.groupBy(identity).values
        .map(g => { val p = g.size / n; -p * math.log(p) }).sum
    val hy = entropy(base.map(_._1).toSeq)
    val hx = entropy(base.map(_._2).toSeq)
    val hxy = entropy(base.toSeq)
    val mi = hy + hx - hxy
    val row = q("ml_uncertainty_coef").head()
    assert(row.getAs[Long]("n") == base.length)
    assert(math.abs(row.getAs[Double]("mutual_info_nats") - mi) < 1e-3)
    assert(math.abs(row.getAs[Double]("u_lang_given_source") - mi / hy)
      < 1e-3)
    assert(math.abs(row.getAs[Double]("u_source_given_lang") - mi / hx)
      < 1e-3)
  }

  test("ml_ols_multi matches a direct normal-equations solve") {
    val x = li.map(_._1); val z = li.map(_._2); val y = li.map(_._4)
    val n = li.length.toDouble
    val mx = x.sum / n; val mz = z.sum / n; val my = y.sum / n
    val sxx = x.map(v => (v - mx) * (v - mx)).sum
    val szz = z.map(v => (v - mz) * (v - mz)).sum
    val sxz = x.zip(z).map { case (a, b) => (a - mx) * (b - mz) }.sum
    val sxy = x.zip(y).map { case (a, b) => (a - mx) * (b - my) }.sum
    val szy = z.zip(y).map { case (a, b) => (a - mz) * (b - my) }.sum
    val syy = y.map(v => (v - my) * (v - my)).sum
    val det = sxx * szz - sxz * sxz
    val bQty = (szz * sxy - sxz * szy) / det
    val bDisc = (sxx * szy - sxz * sxy) / det
    val icpt = my - bQty * mx - bDisc * mz
    val r2 = (bQty * sxy + bDisc * szy) / syy
    val row = q("ml_ols_multi").head()
    assert(row.getAs[Long]("n") == li.length)
    assert(math.abs(row.getAs[Double]("b_qty") - bQty) < 1e-3)
    assert(math.abs(row.getAs[Double]("b_disc") - bDisc) <
      math.abs(bDisc) * 1e-3 + 1e-2)
    assert(math.abs(row.getAs[Double]("intercept") - icpt) < 1e-2)
    assert(math.abs(row.getAs[Double]("r2") - r2) < 1e-3)
  }

  test("ml_balanced_accuracy matches BA / Youden / markedness") {
    val votes = ord.map(x =>
      (x._3 > 150000.0, Set("1-URGENT", "2-HIGH")(x._2)))
    val tp = votes.count(v => v._1 && v._2).toDouble
    val fn = votes.count(v => v._1 && !v._2).toDouble
    val fp = votes.count(v => !v._1 && v._2).toDouble
    val tn = votes.count(v => !v._1 && !v._2).toDouble
    val tpr = tp / (tp + fn); val tnr = tn / (tn + fp)
    val ppv = tp / (tp + fp); val npv = tn / (tn + fn)
    val row = q("ml_balanced_accuracy").head()
    assert(row.getAs[Long]("tp") == tp.toLong)
    assert(math.abs(row.getAs[Double]("balanced_accuracy") -
      (tpr + tnr) / 2) < 1e-3)
    assert(math.abs(row.getAs[Double]("youden_j") - (tpr + tnr - 1))
      < 1e-3)
    assert(math.abs(row.getAs[Double]("markedness") - (ppv + npv - 1))
      < 1e-3)
  }

  test("ml_hosmer_lemeshow matches the textbook HL chi2") {
    val scored = docs.map(x => (math.min(conf4(x._4) / 1000, 9L),
      conf4(x._4), if (x._2 == "en") 1.0 else 0.0))
    var hs = 0.0; var nBins = 0
    for ((_, g) <- scored.groupBy(_._1)) {
      val nb = g.length.toDouble
      val pbar = g.map(_._2).sum / (nb * 10000.0)
      if (pbar > 0 && pbar < 1) {
        nBins += 1
        val obs = g.map(_._3).sum
        hs += (obs - nb * pbar) * (obs - nb * pbar) /
          (nb * pbar * (1 - pbar))
      }
    }
    val row = q("ml_hosmer_lemeshow").head()
    assert(row.getAs[Long]("n_bins") == nBins)
    assert(math.abs(row.getAs[Double]("hl_chi2") - hs) < 1e-2)
  }
}
