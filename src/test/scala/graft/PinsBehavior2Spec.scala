package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 first-principles pins, behavioral-analytics part 2 (see
  * PinsAbSpec for the discipline).
  */
class PinsBehavior2Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("rfm_segmentation matches a direct median-split census") {
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderdate").cast("date"),
        col("o_totalprice").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getDouble(2)))
    val maxD = o.map(_._2).maxBy(_.toEpochDay)
    val rfm = o.groupBy(_._1).toArray.map { case (_, xs) =>
      val rec = maxD.toEpochDay - xs.map(_._2).maxBy(_.toEpochDay)
        .toEpochDay
      val freq = xs.length.toLong
      val mon = xs.map(x => BigDecimal(x._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
      (rec, freq, mon)
    }
    val n = rfm.length
    def medLow[T](xs: Seq[T])(implicit ord: Ordering[T]): T =
      xs.sorted.apply((n + 1) / 2 - 1)
    val rMed = medLow(rfm.map(_._1).toSeq)
    val fMed = medLow(rfm.map(_._2).toSeq)
    val mMed = medLow(rfm.map(_._3).toSeq)
    val segs = rfm.groupBy { case (r2, f, m) =>
      (if (r2 <= rMed) "2" else "1") +
        (if (f >= fMed) "2" else "1") +
        (if (m >= mMed) "2" else "1")
    }
    val rows = q("rfm_segmentation").collect()
    assert(rows.length == segs.size)
    for (r <- rows) {
      val g = segs(r.getAs[String]("segment"))
      assert(r.getAs[Long]("n_customers") == g.length)
      assert(math.abs(r.getAs[Double]("avg_recency") -
        g.map(_._1).sum.toDouble / g.length) < 1e-3)
      assert(math.abs(r.getAs[Double]("avg_frequency") -
        g.map(_._2).sum.toDouble / g.length) < 1e-3)
      assert(math.abs(r.getAs[Double]("avg_monetary") -
        g.map(_._3).sum / g.length) < 1e-1)
    }
  }

  test("event_activity_concentration matches a direct heavy-user cut") {
    val perUser = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getLong(1))
    val nu = perUser.length.toLong
    val ne = perUser.sum
    val heavy = perUser.filter(c => c * nu > 2 * ne)
    val row = q("event_activity_concentration").head()
    assert(row.getAs[Long]("n_users") == nu)
    assert(row.getAs[Long]("n_events") == ne)
    assert(row.getAs[Long]("n_heavy") == heavy.length)
    assert(math.abs(row.getAs[Double]("heavy_user_share") -
      heavy.length.toDouble / nu) < 1e-3)
    assert(math.abs(row.getAs[Double]("heavy_event_share") -
      heavy.sum.toDouble / ne) < 1e-3)
  }

  test("event_transitions matches direct per-user successor counts") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._3, x._4)).map(_._2)
      s.zip(s.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val outW = trans.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val rows = q("event_transitions").collect()
    assert(rows.length == trans.size)
    for (r <- rows) {
      val key = (r.getString(0), r.getString(1))
      assert(r.getAs[Long]("n") == trans(key), s"cell $key")
      assert(math.abs(r.getAs[Double]("p") -
        trans(key).toDouble / outW(key._1)) < 1e-3)
    }
  }
}
