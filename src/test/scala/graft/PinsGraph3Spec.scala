package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, graph part 3 — PageRank, Katz,
  * label propagation and Adamic-Adar, rebuilt as plain Scala
  * adjacency walks (see PinsAbSpec for the discipline).
  */
class PinsGraph3Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val liPk: Array[(Long, Long)] =
    Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** undirected bipartite edges with numeric ids (suppliers even,
    * parts odd), both directions. */
  private lazy val edges: Seq[(Long, Long)] = {
    val e0 = liPk.distinct.map { case (sk, pk) => (sk * 2, pk * 2 + 1) }
      .distinct
    e0.toSeq ++ e0.toSeq.map(e => (e._2, e._1))
  }

  private lazy val outNbrs: Map[Long, Seq[Long]] =
    edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  test("graph_pagerank matches a direct 5-iteration damped walk") {
    val nodes = outNbrs.keys.toSeq
    val n = nodes.size.toDouble
    var pr = nodes.map(nd => nd -> 1.0 / n).toMap
    for (_ <- 1 to 5) {
      val inflow = new scala.collection.mutable.HashMap[Long, Double]
      for (nd <- nodes; dst <- outNbrs(nd))
        inflow(dst) = inflow.getOrElse(dst, 0.0) +
          pr(nd) / outNbrs(nd).size
      pr = nodes.map(nd =>
        nd -> (0.15 / n + 0.85 * inflow.getOrElse(nd, 0.0))).toMap
    }
    val rows = q("graph_pagerank").collect()
    assert(rows.length == nodes.size)
    for (r <- rows)
      assert(math.abs(r.getAs[Double]("pr") -
        pr(r.getAs[Long]("node"))) < 1e-6)
  }

  test("graph_katz_centrality matches direct damped walk counts") {
    val w1 = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    def hop(prev: Map[Long, Long]): Map[Long, Long] =
      edges.groupBy(_._2).view.mapValues(_.map(e =>
        prev.getOrElse(e._1, 0L)).sum).toMap
    val w2 = hop(w1); val w3 = hop(w2)
    val rows = q("graph_katz_centrality").collect()
    assert(rows.length == w1.size)
    for (r <- rows) {
      val nd = r.getAs[Long]("node")
      assert(r.getAs[Long]("walks1") == w1(nd))
      assert(math.abs(r.getAs[Double]("katz") -
        (4.0 * w1(nd) + 2.0 * w2.getOrElse(nd, 0L) +
          w3.getOrElse(nd, 0L)) / 8.0) < 1e-9)
    }
  }

  test("graph_label_prop matches a direct 3-round min-label vote") {
    var labels = outNbrs.keys.map(nd => nd -> nd).toMap
    for (_ <- 1 to 3) {
      labels = outNbrs.keys.map { node =>
        val votes = outNbrs(node).map(labels)
          .groupBy(identity).view.mapValues(_.size)
        node -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val rows = q("graph_label_prop").collect()
    assert(rows.length == labels.size)
    for (r <- rows)
      assert(r.getAs[Long]("label") == labels(r.getAs[Long]("node")))
  }

  test("graph_adamic_adar matches direct shared-basket weights") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val pairAgg = new scala.collection.mutable
      .HashMap[(Long, Long), (Int, BigDecimal)]
    for ((_, g) <- li.groupBy(_._1)) {
      val ps = g.map(_._2).distinct.sorted
      if (ps.length >= 2) {
        val w = BigDecimal(1.0 / math.log(ps.length.toDouble))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        for (i <- ps.indices; j <- (i + 1) until ps.length) {
          val key = (ps(i), ps(j))
          val (c, acc) = pairAgg.getOrElse(key, (0, BigDecimal(0)))
          pairAgg(key) = (c + 1, acc + w)
        }
      }
    }
    val cands = pairAgg.filter(_._2._1 >= 2).toSeq
      .map { case ((a, b), (c, aa)) => (a, b, c, aa) }
    val top = cands.sortBy { case (a, b, _, aa) => (-aa, a, b) }
      .take(100)
    val rows = q("graph_adamic_adar").collect()
    assert(rows.length == top.length)
    rows.zip(top).foreach { case (r, (a, b, c, aa)) =>
      assert(r.getAs[Long]("part_a") == a)
      assert(r.getAs[Long]("part_b") == b)
      assert(r.getAs[Long]("common") == c)
      assert(math.abs(r.getAs[Double]("aa_score") - aa.toDouble)
        < 1e-5)
    }
  }
}
