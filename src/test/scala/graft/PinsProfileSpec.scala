package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, profiling family (see PinsAbSpec
  * for the discipline).
  */
class PinsProfileSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ord: Array[(Long, Double, String, String)] =
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        r.getString(3)))

  private lazy val docs: Array[(String, String)] =
    Tables.documents(spark, sf).select(col("lang"), col("source"))
      .collect().map(r => (r.getString(0), r.getString(1)))

  test("profile_ks_test matches a direct binned two-sample KS") {
    val binned = ord.map(x =>
      (math.floor(x._2 / 1000.0).toLong, x._1 % 2 == 0))
    val na = binned.count(_._2); val nb = binned.length - na
    val bins = binned.map(_._1).distinct.sorted
    val dMax = bins.map { b =>
      val ca = binned.count(x => x._2 && x._1 <= b).toLong
      val cb = binned.count(x => !x._2 && x._1 <= b).toLong
      math.abs(ca * nb - cb * na)
    }.max
    val row = q("profile_ks_test").head()
    assert(row.getAs[Long]("n_a") == na && row.getAs[Long]("n_b") == nb)
    assert(row.getAs[Long]("d_num") == dMax)
    assert(math.abs(row.getAs[Double]("ks_stat") -
      dMax.toDouble / (na.toLong * nb)) < 1e-3)
  }

  test("profile_skew matches direct per-key count ratios") {
    val counts = Tables.lineitem(spark, sf).groupBy("l_partkey").count()
      .collect().map(_.getLong(1))
    val row = q("profile_skew").head()
    assert(row.getAs[Long]("n_keys") == counts.length)
    assert(row.getAs[Long]("max_n") == counts.max)
    val avg = counts.sum.toDouble / counts.length
    assert(math.abs(row.getAs[Double]("avg_n") - avg) < 1e-3)
    assert(math.abs(row.getAs[Double]("skew_ratio") - counts.max / avg)
      < 1e-3)
  }

  test("profile_entropy matches direct Shannon entropy per column") {
    val rows = q("profile_entropy").collect()
    val colsOf = Map(
      "o_orderstatus" -> ord.map(_._3),
      "o_orderpriority" -> ord.map(_._4))
    assert(rows.length == 2)
    for (r <- rows) {
      val vals = colsOf(r.getAs[String]("col_name"))
      val n = vals.length.toDouble
      val h = -vals.groupBy(identity).values.map { g =>
        val p = g.length / n; p * math.log(p) / math.log(2) }.sum
      assert(r.getAs[Long]("n_distinct") == vals.distinct.length)
      assert(r.getAs[Long]("n") == vals.length)
      assert(math.abs(r.getAs[Double]("entropy") - h) < 1e-3)
    }
  }

  test("profile_mutual_info matches per-cell PMI contributions") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_linestatus"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = li.length.toDouble
    val rows = q("profile_mutual_info").collect()
    for (r <- rows) {
      val a = r.getAs[String]("l_returnflag")
      val b = r.getAs[String]("l_linestatus")
      val nij = li.count(x => x._1 == a && x._2 == b).toDouble
      val nx = li.count(_._1 == a).toDouble
      val ny = li.count(_._2 == b).toDouble
      assert(r.getAs[Long]("n") == nij.toLong)
      val pmi = (nij / n) * math.log(nij * n / (nx * ny))
      assert(math.abs(r.getAs[Double]("pmi") - pmi) < 1e-3)
    }
  }

  test("profile_hill_tail matches a direct top-k Hill estimator") {
    val topk = ord.sortBy(x => (-x._2, x._1)).take(50).map(_._2)
    val xk = topk.last
    val meanLog = topk.init.map(v => math.log(v / xk)).sum / 49
    val row = q("profile_hill_tail").head()
    assert(row.getAs[Long]("n_top") == 49)
    assert(math.abs(row.getAs[Double]("hill_alpha") - 1.0 / meanLog)
      < 1e-3)
  }

  test("profile_outlier_iqr matches direct Tukey-fence counts") {
    val rows = q("profile_outlier_iqr").collect()
    val byG = ord.groupBy(_._3)
    assert(rows.length == byG.size)
    for (r <- rows) {
      val g = byG(r.getAs[String]("g"))
      val vs = g.sortBy(x => x._2).map(_._2)
      val n = vs.length
      val q1 = vs(math.ceil(n * 0.25).toInt - 1)
      val q3 = vs(math.ceil(n * 0.75).toInt - 1)
      val lo = q1 - 1.5 * (q3 - q1); val hi = q3 + 1.5 * (q3 - q1)
      assert(r.getAs[Long]("n_rows") == n)
      assert(math.abs(r.getAs[Double]("q1") - q1) < 1e-9)
      assert(math.abs(r.getAs[Double]("q3") - q3) < 1e-9)
      assert(r.getAs[Long]("n_outliers") ==
        vs.count(v => v < lo || v > hi))
    }
  }

  test("profile_eta_squared matches a direct ANOVA variance ratio") {
    val cents = ord.map(x => (x._4,
      BigDecimal(x._2).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact))
    val n = cents.length.toDouble
    val grand = cents.map(_._2).sum.toDouble / n
    val ssb = cents.groupBy(_._1).values.map { g =>
      val m = g.map(_._2).sum.toDouble / g.length
      g.length * (m - grand) * (m - grand) }.sum
    val sst = cents.map(x => (x._2 - grand) * (x._2 - grand)).sum
    val row = q("profile_eta_squared").head()
    assert(row.getAs[Long]("n_groups") == cents.map(_._1).distinct.length)
    assert(row.getAs[Long]("n_rows") == cents.length)
    assert(math.abs(row.getAs[Double]("eta2") - ssb / sst) < 1e-3)
  }

  test("profile_gini_impurity matches direct 1 - sum p^2 per source") {
    val rows = q("profile_gini_impurity").collect()
    val bySrc = docs.groupBy(_._2)
    assert(rows.length == bySrc.size)
    for (r <- rows) {
      val g = bySrc(r.getAs[String]("source"))
      val n = g.length.toDouble
      val byLang = g.groupBy(_._1).values.map(_.length)
      val gini = 1.0 - byLang.map(c => (c / n) * (c / n)).sum
      assert(r.getAs[Long]("n_docs") == g.length)
      assert(r.getAs[Long]("n_langs") == byLang.size)
      assert(math.abs(r.getAs[Double]("gini_impurity") - gini) < 1e-3)
      assert(math.abs(r.getAs[Double]("majority_share") -
        byLang.max / n) < 1e-3)
    }
  }

  test("profile_renyi matches the direct Renyi entropy ladder") {
    val n = docs.length.toDouble
    val ps = docs.groupBy(_._1).values.map(_.length / n).toSeq
    val h0 = math.log(ps.size)
    val h1 = -ps.map(p => p * math.log(p)).sum
    val h2 = -math.log(ps.map(p => p * p).sum)
    val hInf = -math.log(ps.max)
    val row = q("profile_renyi").head()
    assert(row.getAs[Long]("k_langs") == ps.size)
    assert(math.abs(row.getAs[Double]("h0") - h0) < 1e-3)
    assert(math.abs(row.getAs[Double]("h1") - h1) < 1e-3)
    assert(math.abs(row.getAs[Double]("h2") - h2) < 1e-3)
    assert(math.abs(row.getAs[Double]("h_inf") - hInf) < 1e-3)
    assert(math.abs(row.getAs[Double]("effective_langs") -
      math.exp(h1)) < 1e-1)
  }

  test("profile_cramers_v matches an observed-cell chi2") {
    val pairs = ord.map(x => (x._3, x._4))
    val n = pairs.length.toDouble
    val ka = pairs.map(_._1).distinct.length
    val kb = pairs.map(_._2).distinct.length
    val chi2 = pairs.groupBy(identity).map { case ((a, b), g) =>
      val e = pairs.count(_._1 == a).toDouble *
        pairs.count(_._2 == b) / n
      (g.length - e) * (g.length - e) / e
    }.sum
    val v = math.sqrt(chi2 / (n * (math.min(ka, kb) - 1)))
    val row = q("profile_cramers_v").head()
    assert(row.getAs[Long]("n") == pairs.length)
    assert(row.getAs[Long]("df") == (ka - 1).toLong * (kb - 1))
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-2)
    assert(math.abs(row.getAs[Double]("cramers_v") - v) < 1e-3)
  }
}
