package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, time-series family part 2 —
  * windowed indicators and two-series tests (see PinsAbSpec for the
  * discipline).
  */
class PinsTime2Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val daily: Array[(java.time.LocalDate, Long, Long)] =
    Tables.orders(spark, sf)
      .select(col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toArray
      .map { case (d, xs) => (d, xs.map(_._2).sum, xs.length.toLong) }
      .sortBy(_._1.toEpochDay)

  private lazy val evDaily: Array[(java.time.LocalDate, Long, Long)] =
    Tables.events(spark, sf)
      .select(col("ts").cast("date"),
        expr("CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).toArray
      .map { case (d, xs) => (d, xs.map(_._2).sum, xs.length.toLong) }
      .sortBy(_._1.toEpochDay)

  test("time_cusum matches a direct scaled cumulative-deviation walk") {
    val counts = evDaily.map(x => (x._1, x._3))
    val dd = counts.length.toLong
    val nn = counts.map(_._2).sum
    var run = 0L
    val scaled = counts.zipWithIndex.map { case ((day, c), i) =>
      run += c
      (day, c, dd * run - (i + 1) * nn)
    }
    val peak = scaled.maxBy(x => (math.abs(x._3), -x._1.toEpochDay))
    val rows = q("time_cusum").collect()
    assert(rows.length == counts.length)
    rows.zip(scaled).foreach { case (r, (day, c, sVal)) =>
      assert(r.getDate(0).toLocalDate == day)
      assert(r.getAs[Long]("n") == c)
      assert(r.getAs[Long]("s_scaled") == sVal)
      assert(r.getAs[Int]("is_changepoint") ==
        (if (day == peak._1) 1 else 0))
    }
  }

  test("time_smape matches direct symmetric percentage errors") {
    val c = daily.map(_._2)
    val idx = 7 until c.length
    def sm(lagK: Int) = idx.map { t =>
      val y = c(t).toDouble; val f = c(t - lagK).toDouble
      if (y + f == 0) 0.0 else 2.0 * math.abs(y - f) / (y + f)
    }.sum / idx.length * 100.0
    val row = q("time_smape").head()
    assert(row.getAs[Long]("n_days") == idx.length)
    assert(math.abs(row.getAs[Double]("smape_lag7_pct") - sm(7)) < 1e-2)
    assert(math.abs(row.getAs[Double]("smape_naive_pct") - sm(1)) < 1e-2)
  }

  test("time_stochastic_k matches a direct 14-day range position") {
    val c = daily.map(_._2)
    val rows = q("time_stochastic_k").collect()
    val expect = daily.indices.flatMap { t =>
      if (t < 13) None
      else {
        val win = c.slice(t - 13, t + 1)
        val mn = win.min; val mx = win.max
        if (mx == mn) None
        else Some((daily(t)._1,
          100.0 * (c(t) - mn) / (mx - mn)))
      }
    }
    assert(rows.length == expect.length)
    rows.zip(expect).foreach { case (r, (day, k)) =>
      assert(r.getDate(0).toLocalDate == day)
      assert(math.abs(r.getAs[Double]("k_pct") - k) < 1e-3)
    }
    // %D: mean of the three most recent %K values (where all exist)
    for (i <- 2 until expect.length) {
      val dExp = (expect(i)._2 + expect(i - 1)._2 + expect(i - 2)._2) / 3
      if (!rows(i).isNullAt(rows(i).fieldIndex("d_pct")))
        assert(math.abs(rows(i).getAs[Double]("d_pct") - dExp) < 1e-3)
    }
  }

  test("time_bollinger matches direct 20-day mean/2-sigma bands") {
    val c = daily.map(_._2)
    val rows = q("time_bollinger").collect()
    assert(rows.length == c.length - 19)
    rows.zipWithIndex.foreach { case (r, i) =>
      val t = i + 19
      val win = c.slice(t - 19, t + 1).map(_.toDouble)
      val ma = win.sum / 20
      val sd = math.sqrt(win.map(v => (v - ma) * (v - ma)).sum / 19)
      assert(r.getDate(0).toLocalDate == daily(t)._1)
      assert(math.abs(r.getAs[Long]("ma_cents") - ma) < 0.51)
      val y = c(t).toDouble
      val band = if (y - ma > 2 * sd) "above"
        else if (ma - y > 2 * sd) "below" else "inside"
      assert(r.getAs[String]("band") == band)
      if (sd > 0)
        assert(math.abs(r.getAs[Double]("pct_b") -
          ((y - (ma - 2 * sd)) / (4 * sd))) < 1e-3)
    }
  }

  test("time_wape matches direct per-priority weighted errors") {
    val byPrio = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        col("o_orderdate").cast("date"),
        expr("CAST(CAST(o_totalprice AS DECIMAL(18,2))*100 AS BIGINT)"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(_._1)
    val rows = q("time_wape").collect()
    assert(rows.length == byPrio.size)
    for (r <- rows) {
      val prio = r.getAs[String]("prio")
      val ser = byPrio(prio).groupBy(_._2).toArray
        .map { case (d, xs) => (d, xs.map(_._3).sum) }
        .sortBy(_._1.toEpochDay).map(_._2)
      val idx = 7 until ser.length
      val sy = idx.map(ser(_)).sum.toDouble
      val sae = idx.map(t => math.abs(ser(t) - ser(t - 7))).sum
      val se = idx.map(t => ser(t) - ser(t - 7)).sum
      assert(r.getAs[Long]("n_days") == idx.length)
      assert(math.abs(r.getAs[Double]("wape") - sae / sy) < 1e-3)
      assert(math.abs(r.getAs[Double]("bias_pct") - se / sy) < 1e-3)
    }
  }

  test("time_rolling_corr matches direct trailing-7-day Pearson") {
    val rows = q("time_rolling_corr").collect()
    assert(rows.length == evDaily.length)
    rows.zipWithIndex.foreach { case (r, t) =>
      assert(r.getDate(0).toLocalDate == evDaily(t)._1)
      if (t >= 6) {
        val win = evDaily.slice(t - 6, t + 1)
        val xs = win.map(_._2.toDouble); val ys = win.map(_._3.toDouble)
        val mx = xs.sum / 7; val my = ys.sum / 7
        val vx = xs.map(v => (v - mx) * (v - mx)).sum
        val vy = ys.map(v => (v - my) * (v - my)).sum
        if (vx > 0 && vy > 0) {
          val rho = xs.zip(ys)
            .map { case (a, b) => (a - mx) * (b - my) }.sum /
            math.sqrt(vx * vy)
          assert(math.abs(r.getAs[Double]("roll_corr") - rho) < 1e-3)
        }
      } else assert(r.isNullAt(r.fieldIndex("roll_corr")))
    }
  }

  test("time_granger_f matches direct restricted/unrestricted RSS") {
    // (y_t, x = y_{t-1}, z = cnt_{t-1}) in exact dollars / counts
    val ser = daily.map(x => (x._2 / 100.0, x._3.toDouble))
    val rows = (1 until ser.length).map(t =>
      (ser(t)._1, ser(t - 1)._1, ser(t - 1)._2))
    val n = rows.length.toDouble
    val my = rows.map(_._1).sum / n
    val mx = rows.map(_._2).sum / n
    val mz = rows.map(_._3).sum / n
    val cxx = rows.map(r => (r._2 - mx) * (r._2 - mx)).sum
    val czz = rows.map(r => (r._3 - mz) * (r._3 - mz)).sum
    val cxz = rows.map(r => (r._2 - mx) * (r._3 - mz)).sum
    val cxy = rows.map(r => (r._2 - mx) * (r._1 - my)).sum
    val czy = rows.map(r => (r._3 - mz) * (r._1 - my)).sum
    // restricted: y ~ x
    val bR = cxy / cxx
    val rssR = rows.map { r =>
      val e = (r._1 - my) - bR * (r._2 - mx); e * e }.sum
    // unrestricted: y ~ x + z
    val det = cxx * czz - cxz * cxz
    val b1 = (czz * cxy - cxz * czy) / det
    val b2 = (cxx * czy - cxz * cxy) / det
    val rssU = rows.map { r =>
      val e = (r._1 - my) - b1 * (r._2 - mx) - b2 * (r._3 - mz)
      e * e }.sum
    val f = (rssR - rssU) * (n - 3) / rssU
    val row = q("time_granger_f").head()
    assert(row.getAs[Long]("n") == rows.length)
    assert(math.abs(row.getAs[Double]("f_stat") - f) < 1e-2)
    assert(row.getAs[Boolean]("granger_05") ==
      (row.getAs[Double]("f_stat") > 3.8415))
  }
}
