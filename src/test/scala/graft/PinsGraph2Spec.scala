package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, graph family part 2 — triangles,
  * clustering, rich club and label-propagation modularity, all
  * rebuilt with hash-map graph walks (see PinsAbSpec for the
  * discipline).
  */
class PinsGraph2Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val liPk: Array[(Long, Long)] =
    Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** thresholded co-supply edges a<b with >= minW shared parts. */
  private lazy val coEdges: Set[(Long, Long)] = {
    val byPart = liPk.distinct.groupBy(_._1)
    val counts = new scala.collection.mutable.HashMap[(Long, Long), Int]
    for ((_, g) <- byPart) {
      val sks = g.map(_._2).distinct.sorted
      for (i <- sks.indices; j <- (i + 1) until sks.length)
        counts((sks(i), sks(j))) =
          counts.getOrElse((sks(i), sks(j)), 0) + 1
    }
    counts.filter(_._2 >= 25).keySet.toSet
  }

  private lazy val adj: Map[Long, Set[Long]] = {
    val sym = coEdges.toSeq ++ coEdges.toSeq.map(e => (e._2, e._1))
    sym.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("graph_triangles matches a direct per-node triangle census") {
    val triOf = new scala.collection.mutable.HashMap[Long, Long]
    for ((a, b) <- coEdges; c <- adj(a).intersect(adj(b)) if c > b) {
      // each (a<b<c) triangle counted once, credited to all corners
      triOf(a) = triOf.getOrElse(a, 0L) + 1
      triOf(b) = triOf.getOrElse(b, 0L) + 1
      triOf(c) = triOf.getOrElse(c, 0L) + 1
    }
    val rows = q("graph_triangles").collect()
    assert(rows.length == triOf.size)
    for (r <- rows)
      assert(r.getAs[Long]("n_triangles") ==
        triOf(r.getAs[Long]("node")))
  }

  test("graph_clustering_coef matches 2T/deg(deg-1) per node") {
    val triOf = new scala.collection.mutable.HashMap[Long, Long]
    for ((a, b) <- coEdges; c <- adj(a).intersect(adj(b)) if c > b) {
      triOf(a) = triOf.getOrElse(a, 0L) + 1
      triOf(b) = triOf.getOrElse(b, 0L) + 1
      triOf(c) = triOf.getOrElse(c, 0L) + 1
    }
    val rows = q("graph_clustering_coef").collect()
    val expected = adj.filter(_._2.size >= 2)
    assert(rows.length == expected.size)
    for (r <- rows) {
      val node = r.getAs[Long]("node")
      val deg = adj(node).size.toDouble
      val t = triOf.getOrElse(node, 0L).toDouble
      assert(r.getAs[Long]("deg") == deg.toLong)
      assert(r.getAs[Long]("n_triangles") == t.toLong)
      assert(math.abs(r.getAs[Double]("clustering_coef") -
        2 * t / (deg * (deg - 1))) < 1e-3)
    }
  }

  test("graph_rich_club matches direct hub-subgraph densities") {
    val deg = adj.view.mapValues(_.size).toMap
    val rows = q("graph_rich_club").collect()
    assert(rows.length == 4)
    for (r <- rows) {
      val k = r.getAs[Int]("k")
      val hubs = deg.filter(_._2 > k).keySet
      val ek = coEdges.count(e => hubs(e._1) && hubs(e._2))
      val nk = hubs.size
      assert(r.getAs[Long]("n_nodes") == nk)
      assert(r.getAs[Long]("n_edges") == ek)
      if (nk > 1)
        assert(math.abs(r.getAs[Double]("phi") -
          2.0 * ek / (nk.toLong * (nk - 1))) < 1e-3)
    }
  }

  test("graph_modularity matches a direct 3-round label-prop census") {
    // bipartite supplier/part graph with node ids 2*sk / 2*pk+1
    val e0 = liPk.distinct.map { case (pk, sk) => (sk * 2, pk * 2 + 1) }
      .distinct
    val sym = e0 ++ e0.map(e => (e._2, e._1))
    val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      labels = nbrs.keys.map { node =>
        val cand = nbrs(node).map(labels)
          .groupBy(identity).view.mapValues(_.size)
        node -> cand.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    val tagged = sym.map { case (s0, d0) => (labels(s0), labels(d0)) }
    val mDir = tagged.length.toDouble
    val perC = tagged.groupBy(_._1)
    var modularity = 0.0
    val qTerms = perC.view.mapValues { g =>
      val eIn = g.count(x => x._1 == x._2).toDouble
      val dC = g.length.toDouble
      val term = BigDecimal(eIn / mDir - (dC / mDir) * (dC / mDir))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
      modularity += term
      term
    }.toMap
    val rows = q("graph_modularity").collect()
    assert(rows.length == perC.size)
    for (r <- rows) {
      val c = r.getAs[Long]("community")
      assert(r.getAs[Long]("d_c") == perC(c).length)
      assert(math.abs(r.getAs[Double]("q_term") - qTerms(c)) < 1e-6)
      assert(math.abs(r.getAs[Double]("modularity") - modularity)
        < 1e-6)
    }
  }
}
