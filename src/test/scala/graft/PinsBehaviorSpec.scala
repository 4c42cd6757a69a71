package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, behavioral-analytics family (see
  * PinsAbSpec for the discipline).
  */
class PinsBehaviorSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ev: Array[(Long, String, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  test("retention_dn matches direct D1/D7 return flags") {
    val ud = ev.map(x => (x._1, x._3 / 86400000000L)).distinct
    val d0 = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val days = ud.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val r1 = d0.count { case (u, f) => days(u)(f + 1) }
    val r7 = d0.count { case (u, f) => days(u)(f + 7) }
    val row = q("retention_dn").head()
    assert(row.getAs[Long]("n_users") == d0.size)
    assert(row.getAs[Long]("d1_retained") == r1)
    assert(row.getAs[Long]("d7_retained") == r7)
    assert(math.abs(row.getAs[Double]("d1_rate") -
      r1.toDouble / d0.size) < 1e-3)
    assert(math.abs(row.getAs[Double]("d7_rate") -
      r7.toDouble / d0.size) < 1e-3)
  }

  test("funnel_multistep matches a direct strict-order walk") {
    val week = 7L * 86400000000L
    val byUser = ev.groupBy(_._1)
    var nS = 0; var nC = 0; var nP = 0
    for ((_, xs) <- byUser) {
      val signups = xs.filter(_._2 == "signup").map(_._3)
      if (signups.nonEmpty) {
        nS += 1
        val t1 = signups.min
        val clicks = xs.filter(x => x._2 == "click" &&
          x._3 >= t1 && x._3 <= t1 + week).map(_._3)
        if (clicks.nonEmpty) {
          nC += 1
          val t2 = clicks.min
          if (xs.exists(x => x._2 == "purchase" &&
            x._3 >= t2 && x._3 <= t2 + week)) nP += 1
        }
      }
    }
    val row = q("funnel_multistep").head()
    assert(row.getAs[Long]("n_signup") == nS)
    assert(row.getAs[Long]("n_click") == nC)
    assert(row.getAs[Long]("n_purchase") == nP)
    assert(math.abs(row.getAs[Double]("purchase_rate") -
      nP.toDouble / nS) < 1e-3)
  }

  test("pareto_topn matches a direct 80 percent frontier count") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_partkey"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100" +
          " AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = q("pareto_topn").collect()
    val byFlag = li.groupBy(_._1)
    assert(rows.length == byFlag.size)
    for (r <- rows) {
      val parts = byFlag(r.getAs[String]("flag"))
        .groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy { case (pk, rev) => (-rev, pk) }
      val tot = parts.map(_._2).sum.toDouble
      var cum = 0L
      val n80 = parts.count { case (_, rev) =>
        val before = cum; cum += rev; before / tot < 0.8 }
      assert(r.getAs[Long]("n_parts") == parts.length)
      assert(r.getAs[Long]("n_parts_80") == n80)
      assert(math.abs(r.getAs[Double]("pct_of_parts") -
        n80.toDouble / parts.length) < 1e-3)
    }
  }

  test("cohort_retention matches a direct cohort-offset census") {
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate").cast("date"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.withDayOfMonth(1)))
    val firstM = o.groupBy(_._1).view.mapValues(_.map(_._2)
      .minBy(_.toEpochDay)).toMap
    val cells = o.map { case (ck, m) =>
      val f = firstM(ck)
      ((f, (m.getYear - f.getYear) * 12 + m.getMonthValue -
        f.getMonthValue), ck)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val rows = q("cohort_retention").collect()
    assert(rows.length == cells.size)
    for (r <- rows) {
      val key = (r.getDate(0).toLocalDate, r.getAs[Long]("offset_m"))
      assert(cells((key._1, key._2.toInt)) == r.getAs[Long]("n_active"),
        s"cell $key")
    }
  }

  test("market_basket matches a hash-map pair-count and lift") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val baskets = li.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.sorted).toMap
    val pairCnt = new scala.collection.mutable.HashMap[(Long, Long), Int]
    for ((_, ps) <- baskets; i <- ps.indices; j <- (i + 1) until ps.length)
      pairCnt((ps(i), ps(j))) = pairCnt.getOrElse((ps(i), ps(j)), 0) + 1
    val itemCnt = li.groupBy(_._2).view.mapValues(_.map(_._1)
      .distinct.size).toMap
    val nOrders = baskets.size
    val rows = q("market_basket").collect()
    for (r <- rows) {
      val a = r.getAs[Long]("part_a"); val b = r.getAs[Long]("part_b")
      val pc = pairCnt((a, b))
      assert(pc >= 2)
      assert(r.getAs[Long]("pair_cnt") == pc)
      val lift = pc.toDouble * nOrders / (itemCnt(a).toDouble * itemCnt(b))
      assert(math.abs(r.getAs[Double]("lift") - lift) < 1e-3)
    }
    // the top-100 really is the top by (pair_cnt desc, a, b)
    val expectTop = pairCnt.toSeq.filter(_._2 >= 2)
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(100)
      .map(_._1)
    assert(rows.map(r => (r.getAs[Long]("part_a"),
      r.getAs[Long]("part_b"))).toSeq == expectTop)
  }
}
