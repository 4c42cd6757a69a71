package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, vocabulary-law family (see
  * PinsAbSpec for the discipline).
  */
class PinsText2Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val docs: Array[(String, String)] =
    Tables.documents(spark, sf).select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))

  /** per-source word histogram (empty tokens dropped). */
  private lazy val wcBySource: Map[String, Map[String, Int]] =
    docs.groupBy(_._1).view.mapValues { ds =>
      ds.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length).toMap
    }.toMap

  test("text_zipf_slope matches a direct log-log rank regression") {
    // corpus-wide histogram, empty tokens INCLUDED (the operator's
    // tokenization has no empty filter)
    val hist = docs.flatMap(_._2.split(" ", -1))
      .groupBy(identity).view.mapValues(_.length).toSeq
    val top = hist.sortBy { case (t, c2) => (-c2, t) }.take(100)
    val pts = top.zipWithIndex.map { case ((_, c2), i) =>
      (math.log(i + 1.0), math.log(c2.toDouble)) }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val row = q("text_zipf_slope").head()
    assert(row.getAs[Long]("n") == top.length) // whole vocab if < 100
    assert(math.abs(row.getAs[Double]("zipf_slope") - slope) < 1e-3)
  }

  test("text_heaps_law matches a direct log-log V-vs-N regression") {
    val pts = wcBySource.values.map { hist =>
      (math.log(hist.values.sum.toDouble), math.log(hist.size.toDouble))
    }.toSeq
    val k = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    val kConst = math.exp((sy - beta * sx) / k)
    val row = q("text_heaps_law").head()
    assert(row.getAs[Long]("n_sources") == pts.length)
    assert(math.abs(row.getAs[Double]("heaps_beta") - beta) < 1e-3)
    assert(math.abs(row.getAs[Double]("heaps_k") - kConst) <
      kConst * 1e-3 + 1e-2)
  }

  test("text_chao1_richness matches the bias-corrected estimator") {
    val rows = q("text_chao1_richness").collect()
    assert(rows.length == wcBySource.size)
    for (r <- rows) {
      val hist = wcBySource(r.getAs[String]("source"))
      val v = hist.size.toDouble
      val v1 = hist.count(_._2 == 1).toDouble
      val v2 = hist.count(_._2 == 2).toDouble
      val nTok = hist.values.sum.toDouble
      val chao1 = v + v1 * (v1 - 1) / (2 * (v2 + 1))
      assert(r.getAs[Long]("vocab") == v.toLong)
      assert(r.getAs[Long]("v1") == v1.toLong)
      assert(r.getAs[Long]("v2") == v2.toLong)
      assert(math.abs(r.getAs[Double]("chao1") - chao1) < 1e-1)
      assert(math.abs(r.getAs[Double]("coverage") - (1 - v1 / nTok))
        < 1e-3)
    }
  }

  test("text_lexical_richness matches Honore/Brunet/Sichel constants") {
    val rows = q("text_lexical_richness").collect()
    for (r <- rows) {
      val hist = wcBySource(r.getAs[String]("source"))
      val v = hist.size.toDouble
      val v1 = hist.count(_._2 == 1).toDouble
      val v2 = hist.count(_._2 == 2).toDouble
      val nTok = hist.values.sum.toDouble
      val honore = 100.0 * math.log(nTok) * v / (v - v1)
      val brunet = math.pow(nTok, math.pow(v, -0.165))
      assert(r.getAs[Long]("n_tokens") == nTok.toLong)
      assert(math.abs(r.getAs[Double]("honore_r") - honore) <
        honore * 1e-4 + 1e-1)
      assert(math.abs(r.getAs[Double]("brunet_w") - brunet) <
        brunet * 1e-4 + 1e-1)
      assert(math.abs(r.getAs[Double]("sichel_s") - v2 / v) < 1e-3)
    }
  }
}
