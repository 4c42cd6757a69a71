package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, text-diversity and event-behavior
  * families (see PinsAbSpec for the discipline). Tokenization for the
  * text keys is re-done in plain Scala (split on single spaces, drop
  * empties — the operators' exact convention) so the statistics are
  * recomputed from raw text, not from the engine's histograms.
  */
class PinsTextEventSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val docs: Array[(Long, String, String, String)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3)))

  private lazy val ev: Array[(Long, String, java.time.LocalDate)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts").cast("date"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDate(2).toLocalDate))

  /** source -> word histogram with the operators' tokenization. */
  private lazy val wcBySource: Map[String, Map[String, Int]] =
    docs.groupBy(_._3).view.mapValues { ds =>
      ds.flatMap(_._4.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length).toMap
    }.toMap

  test("event_fano_factor matches direct variance/mean of daily counts") {
    val rows = q("event_fano_factor").collect()
    val byType = ev.groupBy(_._2)
    assert(rows.length == byType.size)
    for (r <- rows) {
      val g = byType(r.getAs[String]("event_type"))
      val dailyCounts = g.groupBy(_._3).values.map(_.length).toSeq
      val n = dailyCounts.length
      val mean = dailyCounts.sum.toDouble / n
      val varS = dailyCounts.map(c => (c - mean) * (c - mean)).sum /
        (n - 1)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("s") == dailyCounts.sum)
      assert(math.abs(r.getAs[Double]("fano") - varS / mean) < 1e-3)
      assert(r.getAs[Boolean]("overdispersed") ==
        (r.getAs[Double]("fano") > 1.0))
    }
  }

  test("event_diversity_index matches direct per-user Gini-Simpson") {
    val perUser = ev.groupBy(_._1).toArray.map { case (_, xs) =>
      val n = xs.length.toDouble
      val ssq = xs.groupBy(_._2).values
        .map(g => g.length.toDouble * g.length).sum
      1.0 - ssq / (n * n)
    }
    val rows = q("event_diversity_index").collect()
    // band = floor(div_1e6 / 5000); verify user counts and ranges
    val byBand = perUser.groupBy(dv => (dv * 1e6).round / 5000)
    for (r <- rows) {
      val band = r.getAs[Int]("band")
      val g = byBand.get(band.toLong)
      assert(g.isDefined, s"band $band")
      assert(r.getAs[Long]("n_users") == g.get.length)
      assert(math.abs(r.getAs[Double]("min_diversity") - g.get.min)
        < 1e-3)
      assert(math.abs(r.getAs[Double]("max_diversity") - g.get.max)
        < 1e-3)
    }
    assert(rows.map(_.getAs[Long]("n_users")).sum == perUser.length)
  }

  test("event_stickiness matches direct DAU/MAU per month") {
    val rows = q("event_stickiness").collect()
    val byMonth = ev.groupBy(x => (x._3.getYear, x._3.getMonthValue))
    assert(rows.length == byMonth.size)
    for (r <- rows) {
      val m = r.getDate(0).toLocalDate
      val g = byMonth((m.getYear, m.getMonthValue))
      val mau = g.map(_._1).distinct.length
      val days = g.groupBy(_._3).values.map(_.map(_._1).distinct.length)
      val avgDau = days.sum.toDouble / days.size
      assert(r.getAs[Long]("n_days") == days.size)
      assert(r.getAs[Long]("mau") == mau)
      assert(math.abs(r.getAs[Double]("avg_dau") - avgDau) < 1e-3)
      assert(math.abs(r.getAs[Double]("stickiness") - avgDau / mau)
        < 1e-3)
    }
  }

  test("text_ttr matches direct per-doc type/token/hapax counts") {
    val rows = q("text_ttr").collect()
    assert(rows.length == docs.length)
    val byId = docs.map(x => x._1 -> x._4).toMap
    for (r <- rows.take(100)) {
      // the operator splits on single spaces WITHOUT dropping empties
      val toks = byId(r.getAs[Long]("doc_id")).split(" ", -1)
      val hist = toks.groupBy(identity).view.mapValues(_.length)
      val nTypes = hist.size
      val hapax = hist.count(_._2 == 1)
      assert(r.getAs[Long]("n_tokens") == toks.length)
      assert(r.getAs[Long]("n_types") == nTypes)
      assert(r.getAs[Long]("n_hapax") == hapax)
      assert(math.abs(r.getAs[Double]("ttr") -
        nTypes.toDouble / toks.length) < 1e-3)
      assert(math.abs(r.getAs[Double]("hapax_rate") -
        hapax.toDouble / nTypes) < 1e-3)
    }
  }

  test("mix_kl_divergence matches direct KL to the uniform mixture") {
    val bySrc = docs.groupBy(_._3).view.mapValues(_.length).toMap
    val n = docs.length.toDouble
    val k = bySrc.size
    val kl = bySrc.values.map { c =>
      val p = c / n; p * math.log(p * k) }.sum
    val rows = q("mix_kl_divergence").collect()
    assert(rows.length == k)
    for (r <- rows) {
      val c = bySrc(r.getAs[String]("source"))
      val p = c / n
      assert(r.getAs[Long]("n_docs") == c)
      assert(math.abs(r.getAs[Double]("share") - p) < 1e-3)
      assert(math.abs(r.getAs[Double]("contribution") -
        p * math.log(p * k)) < 1e-3)
      assert(math.abs(r.getAs[Double]("kl_nats") - kl) < 1e-3)
    }
  }

  test("text_simpson_diversity matches direct pair-probability lambda") {
    val rows = q("text_simpson_diversity").collect()
    assert(rows.length == wcBySource.size)
    for (r <- rows) {
      val hist = wcBySource(r.getAs[String]("source"))
      val nTok = hist.values.sum.toDouble
      val num = hist.values.map(c => c.toDouble * (c - 1)).sum
      val lambda = num / (nTok * (nTok - 1))
      assert(r.getAs[Long]("vocab") == hist.size)
      assert(r.getAs[Long]("n_tokens") == nTok.toLong)
      assert(math.abs(r.getAs[Double]("simpson_lambda") - lambda)
        < 1e-4)
      if (num > 0)
        assert(math.abs(r.getAs[Double]("effective_vocab") -
          1.0 / lambda) < 1e-1)
    }
  }

  test("text_yule_k matches the direct characteristic constant") {
    val rows = q("text_yule_k").collect()
    for (r <- rows) {
      val hist = wcBySource(r.getAs[String]("source"))
      val nTok = hist.values.sum.toDouble
      val s2 = hist.values.map(c => c.toDouble * c).sum
      val k = 10000.0 * (s2 - nTok) / (nTok * nTok)
      assert(math.abs(r.getAs[Double]("yule_k") - k) < 1e-2)
    }
  }

  test("text_hapax_ratio matches direct frequency-spectrum shares") {
    val rows = q("text_hapax_ratio").collect()
    for (r <- rows) {
      val hist = wcBySource(r.getAs[String]("source"))
      val hapax = hist.count(_._2 == 1)
      val dis = hist.count(_._2 == 2)
      val vocab = hist.size.toDouble
      val nTok = hist.values.sum.toDouble
      assert(r.getAs[Long]("hapax") == hapax)
      assert(r.getAs[Long]("dis") == dis)
      assert(math.abs(r.getAs[Double]("hapax_vocab_share") -
        hapax / vocab) < 1e-3)
      assert(math.abs(r.getAs[Double]("hapax_token_share") -
        hapax / nTok) < 1e-3)
    }
  }

  test("text_char_entropy matches direct per-doc character entropy") {
    val rows = q("text_char_entropy").collect()
    val byId = docs.map(x => x._1 -> x._4).toMap
    for (r <- rows.take(100)) {
      val chars = byId(r.getAs[Long]("doc_id")).toCharArray
      val hist = chars.groupBy(identity).view.mapValues(_.length)
      val n = chars.length.toDouble
      val h = -hist.values.map { c =>
        (c / n) * math.log(c / n) / math.log(2) }.sum
      assert(r.getAs[Long]("n") == chars.length)
      assert(r.getAs[Long]("alphabet") == hist.size)
      assert(math.abs(r.getAs[Double]("entropy_bits") - h) < 1e-3)
    }
  }
}
