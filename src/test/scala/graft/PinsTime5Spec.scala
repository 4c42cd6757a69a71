package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, time-series family part 5 —
  * decomposition, naive backtests and SAX discretization (see
  * PinsAbSpec for the discipline).
  */
class PinsTime5Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val evDaily: Array[(java.time.LocalDate, Long)] =
    Tables.events(spark, sf)
      .select(col("ts").cast("date"),
        expr("CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toArray
      .map { case (d, xs) => (d, xs.map(_._2).sum) }
      .sortBy(_._1.toEpochDay)

  test("time_decompose_additive matches a direct STL-lite walk") {
    val n = evDaily.length
    val cents = evDaily.map(_._2.toDouble)
    // centered 7-day MA (complete windows only)
    val trend = evDaily.indices.map { i =>
      if (i >= 3 && i < n - 3)
        Some(cents.slice(i - 3, i + 4).sum / 7.0)
      else None
    }
    val det = evDaily.indices.map(i =>
      trend(i).map(t => cents(i) - t))
    val byDow = evDaily.indices.groupBy(i =>
      evDaily(i)._1.getDayOfWeek.getValue)
    val seas = byDow.view.mapValues { idxs =>
      val xs = idxs.flatMap(det(_))
      xs.sum / xs.length
    }.toMap
    val rows = q("time_decompose_additive").collect()
    assert(rows.length == n)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDate(0).toLocalDate == evDaily(i)._1)
      assert(math.abs(r.getAs[Double]("revenue") - cents(i) / 100)
        < 1e-6)
      trend(i) match {
        case Some(t) =>
          assert(math.abs(r.getAs[Double]("trend") - t / 100) < 1e-2)
          val dow = evDaily(i)._1.getDayOfWeek.getValue
          assert(math.abs(r.getAs[Double]("seasonal") -
            seas(dow) / 100) < 1e-2)
          assert(math.abs(r.getAs[Double]("residual") -
            (cents(i) - t - seas(dow)) / 100) < 5e-2)
        case None => assert(r.isNullAt(r.fieldIndex("trend")))
      }
    }
  }

  test("time_backtest_naive matches direct per-type lag-7 MAE") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")),
        expr("CAST(CAST(value AS DECIMAL(12,4)) * 10000 AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    // per-user ordered stream, lag-7 prediction, grouped by type
    val scored = ev.groupBy(_._2).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._4, x._1))
      s.zipWithIndex.map { case (x, i) =>
        (x._3, if (i >= 7) Some(math.abs(x._5 - s(i - 7)._5)) else None)
      }
    }
    val rows = q("time_backtest_naive").collect()
    val byType = scored.groupBy(_._1)
    assert(rows.length == byType.size)
    for (r <- rows) {
      val g = byType(r.getAs[String]("event_type"))
      val errs = g.flatMap(_._2)
      assert(r.getAs[Long]("n_events") == g.length)
      assert(r.getAs[Long]("n_scored") == errs.length)
      assert(math.abs(r.getAs[Double]("mae") -
        errs.sum.toDouble / errs.length / 10000.0) < 1e-3)
    }
  }

  test("time_sax_symbolize matches direct z-scores and quartile bins") {
    val daily = Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toArray
      .map { case (d, xs) => (d, xs.map(_._2).sum / 100.0) }
      .sortBy(_._1.toEpochDay)
    val n = daily.length
    val mu = daily.map(_._2).sum / n
    val sd = math.sqrt(daily.map(x =>
      (x._2 - mu) * (x._2 - mu)).sum / n)
    val rows = q("time_sax_symbolize").collect()
    assert(rows.length == n)
    rows.zip(daily).foreach { case (r, (d, rev)) =>
      assert(r.getAs[String]("day") == d.toString)
      val z = (rev - mu) / sd
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-3)
      val sym = if (z < -0.6745) "a" else if (z < 0) "b"
        else if (z < 0.6745) "c" else "d"
      assert(r.getAs[String]("sax_symbol") == sym, s"day $d z=$z")
    }
  }
}
