package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, text part 3 — divergence,
  * sequence entropy and readability (see PinsAbSpec for the
  * discipline).
  */
class PinsText3Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val docs: Array[(String, String)] =
    Tables.documents(spark, sf).select(col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))

  test("text_js_divergence matches a direct Jensen-Shannon sum") {
    // empty tokens included (split on single spaces, no filter)
    val en = docs.filter(_._1 == "en").flatMap(_._2.split(" ", -1))
    val other = docs.filter(_._1 != "en").flatMap(_._2.split(" ", -1))
    val ha = en.groupBy(identity).view.mapValues(_.length).toMap
    val hb = other.groupBy(identity).view.mapValues(_.length).toMap
    val na = en.length.toDouble; val nb = other.length.toDouble
    val vocab = (ha.keySet ++ hb.keySet)
    var js = 0.0
    for (t <- vocab) {
      val p = ha.getOrElse(t, 0) / na
      val qq = hb.getOrElse(t, 0) / nb
      if (p > 0) js += p * math.log(2 * p / (p + qq))
      if (qq > 0) js += qq * math.log(2 * qq / (p + qq))
    }
    js *= 0.5
    val row = q("text_js_divergence").head()
    assert(row.getAs[Long]("n_tokens_en") == en.length)
    assert(row.getAs[Long]("n_tokens_other") == other.length)
    assert(row.getAs[Long]("vocab_shared") ==
      ha.keySet.intersect(hb.keySet).size)
    assert(math.abs(row.getAs[Double]("js_nats") - js) < 1e-3)
  }

  test("text_bigram_entropy matches a direct bigram Shannon entropy") {
    val bigrams = docs.flatMap { case (_, t) =>
      val w = t.split(" ", -1)
      if (w.length < 2) Seq.empty[String]
      else w.zip(w.tail).map { case (a, b) => s"$a $b" }.toSeq
    }
    val hist = bigrams.groupBy(identity).view.mapValues(_.length).toMap
    val n = bigrams.length.toDouble
    val h = -hist.values.map { c =>
      (c / n) * math.log(c / n) / math.log(2) }.sum
    val row = q("text_bigram_entropy").head()
    assert(row.getAs[Long]("n_bigrams") == bigrams.length)
    assert(row.getAs[Long]("n_distinct") == hist.size)
    assert(math.abs(row.getAs[Double]("entropy_bits") - h) < 1e-3)
    assert(math.abs(row.getAs[Double]("perplexity") - math.pow(2, h))
      < math.pow(2, h) * 1e-3 + 1e-2)
  }

  test("text_readability matches a direct Flesch computation") {
    val base = docs.map { case (lang, t) =>
      val sentences = math.max(1,
        "[.!?]+".r.findAllIn(t).length).toLong
      val words = t.split("\\s+").count(_.nonEmpty).toLong
      val syllables = "[aeiouy]+".r
        .findAllIn(t.toLowerCase).length.toLong
      (lang, sentences, words, syllables)
    }
    val rows = q("text_readability").collect()
    val byLang = base.groupBy(_._1)
    assert(rows.length == byLang.size)
    for (r <- rows) {
      val g = byLang(r.getAs[String]("lang"))
      val s = g.map(_._2).sum.toDouble
      val w = g.map(_._3).sum.toDouble
      val y = g.map(_._4).sum.toDouble
      // Flesch reading ease: 206.835 - 1.015 (W/S) - 84.6 (Y/W)
      val flesch = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
      assert(r.getAs[Long]("n_sentences") == s.toLong)
      assert(r.getAs[Long]("n_words") == w.toLong)
      assert(r.getAs[Long]("n_syllables") == y.toLong)
      assert(math.abs(r.getAs[Double]("flesch_score") - flesch) < 0.1)
    }
  }
}
