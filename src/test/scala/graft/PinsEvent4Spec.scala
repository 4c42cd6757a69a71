package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, event part 4 — stationary
  * distributions, order-2 paths and multi-touch attribution (see
  * PinsAbSpec for the discipline).
  */
class PinsEvent4Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val ev: Array[(Long, Long, String, Long, String)] =
    Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")), col("props"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getString(4)))

  test("event_markov_stationary matches an 8-step power iteration") {
    val trans = ev.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._4, x._1)).map(_._3)
      s.zip(s.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val states = trans.keys.map(_._1).toSeq.distinct.sorted
    val outW = states.map(st =>
      st -> trans.filter(_._1._1 == st).values.sum).toMap
    var pi = states.map(st => st -> 1.0 / states.size).toMap
    for (_ <- 1 to 8) {
      pi = states.map { v =>
        v -> states.map { u =>
          trans.get((u, v)).map(w =>
            pi(u) * w / outW(u)).getOrElse(0.0)
        }.sum
      }.toMap
    }
    val rows = q("event_markov_stationary").collect()
    assert(rows.length == states.size)
    for (r <- rows) {
      assert(math.abs(r.getAs[Double]("pi_stationary") -
        pi(r.getAs[String]("event_type"))) < 1e-3)
      assert(r.getAs[Int]("n_iter") == 8)
    }
  }

  test("event_paths3 matches a direct ordered-triple census") {
    val triples = ev.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._4, x._1)).map(_._3)
      if (s.length < 3) Seq.empty[(String, String, String)]
      else s.indices.dropRight(2).map(i => (s(i), s(i + 1), s(i + 2)))
    }.groupBy(identity).view.mapValues(_.size).toSeq
    val top = triples.sortBy { case ((a, b, c), n) => (-n, a, b, c) }
      .take(20)
    val rows = q("event_paths3").collect()
    assert(rows.length == top.length)
    rows.zip(top).foreach { case (r, ((a, b, c), n)) =>
      assert((r.getString(0), r.getString(1), r.getString(2)) ==
        ((a, b, c)))
      assert(r.getAs[Long]("n") == n)
    }
  }

  test("event_attribution matches direct linear and last-touch credit") {
    val kRe = """"k"\s*:\s*(-?\d+)""".r
    val clicks = ev.filter(_._3 == "click").map { x =>
      val k = kRe.findFirstMatchIn(x._5).map(_.group(1).toLong)
        .getOrElse(sys.error(s"no k in props: ${x._5}"))
      (x._2, x._1, x._4, s"ch${k % 5}")
    }
    val purchases = ev.filter(_._3 == "purchase")
      .map(x => (x._1, x._2, x._4))
    val linear = new scala.collection.mutable.HashMap[String, Double]
    val lastT = new scala.collection.mutable.HashMap[String, Long]
    val touches = new scala.collection.mutable.HashMap[String, Long]
    for ((pid, u, pt) <- purchases) {
      val ts = clicks.filter(c => c._1 == u && c._3 < pt &&
        pt - c._3 <= 3600000000L)
      if (ts.nonEmpty) {
        val credit = BigDecimal(1.0 / ts.length)
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
        for (c <- ts) {
          linear(c._4) = linear.getOrElse(c._4, 0.0) + credit
          touches(c._4) = touches.getOrElse(c._4, 0L) + 1
        }
        val last = ts.maxBy(c => (c._3, c._2))
        lastT(last._4) = lastT.getOrElse(last._4, 0L) + 1
        val _ = pid
      }
    }
    val rows = q("event_attribution").collect()
    assert(rows.length == touches.size)
    for (r <- rows) {
      val ch = r.getAs[String]("channel")
      assert(r.getAs[Long]("n_touches") == touches(ch))
      assert(math.abs(r.getAs[Double]("linear_credit") - linear(ch))
        < 1e-3)
      assert(r.getAs[Long]("last_touch_credit") ==
        lastT.getOrElse(ch, 0L))
    }
  }
}
