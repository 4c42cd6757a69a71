package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, text part 4 — token counting and
  * n-gram language identification (see PinsAbSpec for the
  * discipline).
  */
class PinsText4Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val docs: Array[(Long, String, String)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("text_tokencount matches direct tokenizer counts") {
    val rows = q("text_tokencount").collect()
    assert(rows.length == docs.length)
    val byId = docs.map(x => x._1 -> x._3).toMap
    val re = "[a-z0-9]+|[^a-z0-9 ]".r
    for (r <- rows.take(100)) {
      val t = byId(r.getAs[Long]("doc_id"))
      val ws = t.split(" ", -1).length
      val reToks = re.findAllIn(t).length
      assert(r.getAs[Int]("ws_tokens") == ws)
      assert(r.getAs[Int]("re_tokens") == reToks)
      assert(r.getAs[Long]("est_bpe_tokens") ==
        math.ceil(t.length / 4.0).toLong)
      assert(math.abs(r.getAs[Double]("chars_per_token") -
        t.length.toDouble / reToks) < 1e-3)
    }
  }

  test("text_langid matches a direct trigram-profile vote") {
    def grams(t: String): Seq[String] =
      if (t.length < 3) Seq.empty
      else (0 to t.length - 3).map(i => t.substring(i, i + 3))
    // per-lang top-40 trigram profiles (count desc, gram asc)
    val profiles = docs.groupBy(_._2).view.mapValues { ds =>
      ds.flatMap(d => grams(d._3))
        .groupBy(identity).view.mapValues(_.length).toSeq
        .sortBy { case (g, c) => (-c, g) }.take(40).map(_._1).toSet
    }.toMap
    val rows = q("text_langid").collect()
    val byId = docs.map(x => x._1 -> x._3).toMap
    for (r <- rows.take(150)) {
      val docGrams = grams(byId(r.getAs[Long]("doc_id"))).toSet
      val scores = profiles.view.mapValues(p =>
        docGrams.intersect(p).size).toSeq
        .filter(_._2 > 0)
      val (bestLang, bestN) = scores.minBy { case (l, n) => (-n, l) }
      assert(r.getAs[String]("predicted_lang") == bestLang)
      assert(r.getAs[Long]("overlap") == bestN)
    }
  }
}
