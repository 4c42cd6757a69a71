package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, graph part 4 — HITS, BFS hops and
  * ego networks (see PinsAbSpec for the discipline).
  */
class PinsGraph4Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("graph_hits matches a direct two-step authority walk") {
    val ord = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (ok, pk) => ord.get(ok).map(c => (c, pk)) }
      .distinct
    val a1 = edges.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val h1 = edges.groupBy(_._1).view
      .mapValues(_.map(e => a1(e._2)).sum).toMap
    val a2 = edges.groupBy(_._2).view
      .mapValues(_.map(e => h1(e._1)).sum).toMap
    val top = a2.toSeq.sortBy { case (p, a) => (-a, p) }.take(20)
    val rows = q("graph_hits").collect()
    assert(rows.length == top.length)
    rows.zip(top).foreach { case (r, (p, a)) =>
      assert(r.getAs[Long]("part") == p)
      assert(r.getAs[Long]("degree") == a1(p))
      assert(r.getAs[Long]("authority2") == a)
    }
  }

  test("graph_shortest_hops matches a direct 4-hop BFS") {
    val liPk = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val counts = new scala.collection.mutable.HashMap[(Long, Long), Int]
    for ((_, g) <- liPk.groupBy(_._1)) {
      val sks = g.map(_._2).distinct.sorted
      for (i <- sks.indices; j <- (i + 1) until sks.length)
        counts((sks(i), sks(j))) =
          counts.getOrElse((sks(i), sks(j)), 0) + 1
    }
    val e = counts.filter(_._2 >= 150).keySet
    val adj = (e.toSeq ++ e.toSeq.map(x => (x._2, x._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val src = e.map(_._1).min
    val dist = new scala.collection.mutable.HashMap[Long, Long]
    dist(src) = 0
    var frontier = Set(src)
    for (h <- 1 to 4) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty))
      for (n <- frontier if !dist.contains(n)) dist(n) = h
    }
    val rows = q("graph_shortest_hops").collect()
    assert(rows.length == dist.size)
    for (r <- rows)
      assert(r.getAs[Long]("dist") == dist(r.getAs[Long]("node")))
  }

  test("graph_ego_2hop matches direct 2-hop reach for top hubs") {
    val liPk = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val counts = new scala.collection.mutable.HashMap[(Long, Long), Int]
    for ((_, g) <- liPk.groupBy(_._1)) {
      val sks = g.map(_._2).distinct.sorted
      for (i <- sks.indices; j <- (i + 1) until sks.length)
        counts((sks(i), sks(j))) =
          counts.getOrElse((sks(i), sks(j)), 0) + 1
    }
    val e = counts.filter(_._2 >= 25).keySet
    val adj = (e.toSeq ++ e.toSeq.map(x => (x._2, x._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size).toMap
    val hubs = deg.toSeq.sortBy { case (n, dg) => (-dg, n) }.take(10)
    val rows = q("graph_ego_2hop").collect()
    assert(rows.length == hubs.length)
    for (r <- rows) {
      val hub = r.getAs[Long]("hub")
      val hop1 = adj(hub)
      val hop2 = hop1.flatMap(adj(_))
      val reach = (hop1 ++ hop2) - hub
      assert(r.getAs[Long]("degree") == deg(hub))
      assert(r.getAs[Long]("ego2_size") == reach.size)
    }
  }
}
