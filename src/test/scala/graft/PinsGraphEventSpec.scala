package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, graph-statistics and event-process
  * families (see PinsAbSpec for the discipline). Graph fixtures are
  * rebuilt from raw lineitem rows with plain hash-map loops — the
  * engine's persisted co-occurrence artifacts are not reused.
  */
class PinsGraphEventSpec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val evFull: Array[(Long, String, Long, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))

  test("event_nelson_aalen matches a direct cumulative-hazard walk") {
    val byUser = evFull.groupBy(_._1)
    val d0 = byUser.flatMap { case (u, xs) =>
      val cs = xs.filter(_._2 == "click").map(_._3 / 86400000000L)
      if (cs.nonEmpty) Some(u -> cs.min) else None
    }
    val dp = byUser.flatMap { case (u, xs) =>
      val ps = xs.filter(_._2 == "purchase").map(_._3 / 86400000000L)
      if (ps.nonEmpty) Some(u -> ps.min) else None
    }
    val tEvents = d0.flatMap { case (u, t0) =>
      dp.get(u).filter(_ >= t0).map(_ - t0) }.toSeq
    val nTotal = d0.size
    val byT = tEvents.groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy(_._1)
    var atRisk = nTotal.toLong
    var hcum = 0.0
    val rows = q("event_nelson_aalen").collect()
    assert(rows.length == byT.size)
    rows.zip(byT).foreach { case (r, (t, dEv)) =>
      hcum += dEv.toDouble / atRisk
      assert(r.getAs[Long]("day") == t)
      assert(r.getAs[Long]("n_risk") == atRisk)
      assert(math.abs(r.getAs[Double]("cum_hazard") - hcum) < 1e-3)
      assert(math.abs(r.getAs[Double]("na_survival") -
        math.exp(-hcum)) < 1e-3)
      atRisk -= dEv
    }
  }

  test("event_hourly_profile matches direct per-type hour shares") {
    val hv = Tables.events(spark, sf)
      .select(hour(col("ts")).cast("int"), col("event_type"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    val rows = q("event_hourly_profile").collect()
    val byType = hv.groupBy(_._2)
    for (r <- rows) {
      val t = r.getAs[String]("event_type")
      val hr = r.getAs[Int]("hr")
      val g = byType(t)
      val n = g.count(_._1 == hr)
      val mx = g.groupBy(_._1).values.map(_.size).max
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("share_pct") -
        100.0 * n / g.size) < 1e-2)
      assert(r.getAs[Boolean]("is_peak") == (n == mx))
    }
    assert(rows.map(_.getAs[Long]("n")).sum == hv.length)
  }

  test("event_interarrival_burstiness matches direct B-value quantiles") {
    val bvs = evFull.groupBy(_._1).toSeq.flatMap { case (u, xs) =>
      val ts = xs.sortBy(x => (x._3, x._4)).map(_._3)
      val dts = ts.zip(ts.tail).map { case (a, b) => (b - a).toDouble }
      val sd = dts.sum
      if (dts.length >= 5 && sd > 0) {
        val n = dts.length
        val sdd = dts.map(x => x * x).sum
        val disc = n * sdd - sd * sd
        Some((u, (math.sqrt(disc) - sd) / (math.sqrt(disc) + sd)))
      } else None
    }
    val nu = bvs.size
    val nBursty = bvs.count(_._2 > 0)
    val sorted = bvs.sortBy { case (u, b) => (b, u) }.map(_._2)
    val ks = Map(10 -> (nu + 9) / 10, 50 -> (nu + 1) / 2,
      90 -> (9 * nu + 9) / 10)
    val rows = q("event_interarrival_burstiness").collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val qq = r.getAs[Int]("q")
      assert(r.getAs[Long]("n_users") == nu)
      assert(r.getAs[Long]("n_bursty") == nBursty)
      assert(r.getAs[Long]("k") == ks(qq))
      assert(math.abs(r.getAs[Double]("b_value") -
        sorted(ks(qq) - 1)) < 1e-6)
    }
  }

  test("event_markov_entropy matches a direct chain entropy rate") {
    val trans = evFull.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val seq2 = xs.sortBy(x => (x._3, x._4)).map(_._2)
      seq2.zip(seq2.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val states = trans.keys.map(_._1).toSeq.distinct.sorted
    val outW = states.map(s =>
      s -> trans.filter(_._1._1 == s).values.sum).toMap
    // 8-step power iteration from uniform (the operator's recursion
    // depth), in plain doubles
    var pi = states.map(s => s -> 1.0 / states.size).toMap
    for (_ <- 1 to 8) {
      pi = states.map { v =>
        v -> states.map { u =>
          trans.get((u, v)).map(w =>
            pi(u) * w / outW(u)).getOrElse(0.0)
        }.sum
      }.toMap
    }
    val h = trans.collect { case ((u, v), w) =>
      val p = w.toDouble / outW(u)
      pi(u) * p * (math.log(1 / p) / math.log(2))
    }.sum
    val row = q("event_markov_entropy").head()
    assert(row.getAs[Long]("n_states") == states.size)
    assert(row.getAs[Long]("n_transitions") == trans.size)
    assert(math.abs(row.getAs[Double]("entropy_rate_bits") - h) < 1e-3)
    assert(math.abs(row.getAs[Double]("max_entropy_bits") -
      math.log(states.size) / math.log(2)) < 1e-3)
  }

  /** distinct (key, node) projections from lineitem. */
  private def coPairs(keyNode: Array[(Long, Long)], minW: Int)
      : Map[(Long, Long), Int] = {
    val byKey = keyNode.distinct.groupBy(_._1)
    val counts = new scala.collection.mutable.HashMap[(Long, Long), Int]
    for ((_, g) <- byKey) {
      val ns = g.map(_._2).distinct.sorted
      for (i <- ns.indices; j <- (i + 1) until ns.length)
        counts((ns(i), ns(j))) =
          counts.getOrElse((ns(i), ns(j)), 0) + 1
    }
    counts.filter(_._2 >= minW).toMap
  }

  private lazy val liPk: Array[(Long, Long, Long)] =
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("graph_assortativity matches degree Pearson over a hash-map " +
      "co-order graph") {
    val edges = coPairs(liPk.map(x => (x._1, x._2)), 2).keys.toSeq
    val und = edges ++ edges.map(e => (e._2, e._1))
    val deg = und.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val xs = und.map(e => deg(e._1)); val ys = und.map(e => deg(e._2))
    val n = und.size
    val mx = xs.sum / n; val my = ys.sum / n
    val r = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum /
      math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
        ys.map(b => (b - my) * (b - my)).sum)
    val row = q("graph_assortativity").head()
    assert(row.getAs[Long]("n") == n)
    assert(math.abs(row.getAs[Double]("assortativity") - r) < 1e-3)
  }

  test("graph_degree_gini matches a direct sorted-degree Gini") {
    val deg = liPk.map(x => (x._3, x._2)).distinct
      .groupBy(_._1).values.map(_.size.toDouble).toSeq.sorted
    val n = deg.size
    val sx = deg.sum
    val gini = deg.zipWithIndex.map { case (x, i) =>
      (2.0 * (i + 1) - n - 1) * x }.sum / (n * sx)
    val row = q("graph_degree_gini").head()
    assert(row.getAs[Long]("n_suppliers") == n)
    assert(row.getAs[Long]("mean_degree") == (sx / n).toLong)
    assert(math.abs(row.getAs[Double]("gini") - gini) < 1e-3)
  }

  test("graph_degree_distribution matches hash-map co-supply degrees") {
    val edges = coPairs(liPk.map(x => (x._2, x._3)), 25).keys.toSeq
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).values.map(_.size)
    val hist = deg.groupBy(identity).view.mapValues(_.size).toMap
    val rows = q("graph_degree_distribution").collect()
    assert(rows.length == hist.size)
    for (r <- rows)
      assert(r.getAs[Long]("n_nodes") ==
        hist(r.getAs[Long]("degree").toInt))
  }
}
