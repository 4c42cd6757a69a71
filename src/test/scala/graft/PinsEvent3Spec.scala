package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, event/graph part 3 — burst
  * windows, lifecycle states, reciprocity and co-occurrence Jaccard
  * (see PinsAbSpec for the discipline).
  */
class PinsEvent3Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ev: Array[(Long, Long, String, Long, Long)] =
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(3) / 1000000L))

  test("event_burst matches a direct 60-second sliding count") {
    val byUser = ev.groupBy(_._2)
    val expected = byUser.view.mapValues { xs =>
      val ts = xs.map(_._5).sorted
      val peak = ts.map(t => ts.count(u => u >= t - 59 && u <= t)).max
      (peak, xs.length)
    }.filter(_._2._1 >= 2).toMap
    val rows = q("event_burst").collect()
    assert(rows.length == expected.size)
    for (r <- rows) {
      val (peak, n) = expected(r.getAs[Long]("user_id"))
      assert(r.getAs[Long]("peak_per_min") == peak)
      assert(r.getAs[Long]("n_events") == n)
    }
  }

  test("event_lifecycle_states matches a direct weekly state census") {
    // week = date_trunc('week') — ISO Monday start
    val uw = ev.filter(_._3 == "purchase").map { x =>
      val day = java.time.LocalDate.ofEpochDay(x._4 / 86400000000L)
      val monday = day.minusDays(day.getDayOfWeek.getValue - 1)
      (x._2, monday)
    }.distinct
    val firstW = uw.groupBy(_._1).view
      .mapValues(_.map(_._2).minBy(_.toEpochDay)).toMap
    val weeksOf = uw.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val states = uw.map { case (u, w) =>
      val st = if (w == firstW(u)) "new"
        else if (weeksOf(u)(w.minusDays(7))) "retained"
        else "resurrected"
      ((w, st), u)
    }.groupBy(_._1).view.mapValues(_.length).toMap
    val rows = q("event_lifecycle_states").collect()
    assert(rows.length == states.size)
    for (r <- rows) {
      val key = (r.getDate(0).toLocalDate, r.getAs[String]("state"))
      assert(states(key) == r.getAs[Long]("n_users"), s"cell $key")
    }
  }

  test("graph_reciprocity matches direct matched-flow ratios") {
    val trans = ev.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._4, x._1)).map(_._3)
      s.zip(s.tail).filter(p => p._1 != p._2)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val unordered = trans.keys.map { case (u, v) =>
      if (u < v) (u, v) else (v, u) }.toSeq.distinct
    var wTotal = 0L; var wRecip = 0L
    val cells = unordered.map { case (u, v) =>
      val wuv = trans.getOrElse((u, v), 0L)
      val wvu = trans.getOrElse((v, u), 0L)
      wTotal += wuv + wvu; wRecip += 2 * math.min(wuv, wvu)
      ((u, v), (wuv, wvu))
    }.toMap
    val rows = q("graph_reciprocity").collect()
    assert(rows.length == cells.size)
    for (r <- rows) {
      val key = (r.getString(0), r.getString(1))
      val (wuv, wvu) = cells(key)
      assert(r.getAs[Long]("w_uv") == wuv)
      assert(r.getAs[Long]("w_vu") == wvu)
      assert(r.getAs[Long]("w_min") == math.min(wuv, wvu))
      assert(math.abs(r.getAs[Double]("reciprocity") -
        wRecip.toDouble / wTotal) < 1e-3)
    }
  }

  test("graph_jaccard matches direct co-order neighbor similarity") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val deg = li.groupBy(_._2).view.mapValues(_.length).toMap
    val common = new scala.collection.mutable.HashMap[(Long, Long), Int]
    for ((_, g) <- li.groupBy(_._1)) {
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        common((ps(i), ps(j))) = common.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val cands = common.filter(_._2 >= 2).toSeq.map { case ((a, b), c) =>
      val uni = deg(a) + deg(b) - c
      (a, b, c, uni, c.toDouble / uni)
    }
    val top = cands.sortBy { case (a, b, _, _, j) => (-j, a, b) }
      .take(100)
    val rows = q("graph_jaccard").collect()
    assert(rows.length == top.length)
    rows.zip(top).foreach { case (r, (a, b, c, uni, j)) =>
      assert(r.getAs[Long]("part_a") == a)
      assert(r.getAs[Long]("part_b") == b)
      assert(r.getAs[Long]("common") == c)
      assert(r.getAs[Long]("union_n") == uni)
      assert(math.abs(r.getAs[Double]("jaccard") - j) < 1e-3)
    }
  }
}
