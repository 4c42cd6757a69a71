package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, text part 5 — novelty and token
  * burstiness (see PinsAbSpec for the discipline).
  */
class PinsText5Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val docs: Array[(Long, String)] =
    Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

  test("text_novelty matches direct first-seen trigram shares") {
    // distinct word-trigrams per doc (the md5 in the operator is just
    // a compaction of the joined trigram — recompute on raw strings)
    val gramsOf = docs.map { case (id, t) =>
      val w = t.split(" ", -1)
      val gs = if (w.length < 3) Set.empty[String]
        else (0 to w.length - 3).map(i =>
          s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
      (id, gs)
    }
    val firstSeen = new scala.collection.mutable.HashMap[String, Long]
    for ((id, gs) <- gramsOf.sortBy(_._1); g <- gs)
      if (!firstSeen.contains(g) || firstSeen(g) > id) firstSeen(g) = id
    val rows = q("text_novelty").collect()
    val expect = gramsOf.filter(_._2.nonEmpty).map { case (id, gs) =>
      id -> (gs.size, gs.count(firstSeen(_) == id)) }.toMap
    assert(rows.length == expect.size)
    for (r <- rows) {
      val (n, novel) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_grams") == n)
      assert(r.getAs[Long]("n_novel") == novel)
      assert(math.abs(r.getAs[Double]("novelty_pct") -
        100.0 * novel / n) < 1e-2)
    }
  }

  test("text_burstiness matches direct variance-to-mean ratios") {
    val toks = docs.flatMap { case (id, t) =>
      t.split(" ", -1).map(w => (w, id)) }
    val top = toks.groupBy(_._1).view.mapValues(_.length).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(20).map(_._1).toSet
    val nDocs = docs.length.toDouble
    val rows = q("text_burstiness").collect()
    assert(rows.length == top.size)
    for (r <- rows) {
      val w = r.getAs[String]("word")
      assert(top(w))
      val perDoc = toks.filter(_._1 == w).groupBy(_._2)
        .values.map(_.length.toDouble).toSeq
      val sc = perDoc.sum
      val scc = perDoc.map(c => c * c).sum
      // population VMR over ALL docs (zeros included):
      // var/mean = (N*E[c^2] - (E[c]*N)^2/N) / (N*E[c]) with zero
      // cells contributing only to N — matches (nd*scc - sc^2)/(nd*sc)
      val vmr = (nDocs * scc - sc * sc) / (nDocs * sc)
      assert(r.getAs[Long]("n_docs_with") == perDoc.size)
      assert(r.getAs[Long]("total_count") == sc.toLong)
      assert(math.abs(r.getAs[Double]("vmr") - vmr) < 1e-3)
    }
  }
}
