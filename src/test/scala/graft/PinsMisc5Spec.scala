package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 third pins wave — formula-bearing keys surfaced by a
  * systematic sweep (oracle SQL containing ln/log/sqrt/pow markers,
  * no recomputation test anywhere in the tree): Benford expectation,
  * power-law OLS decay fit, rolling z-score anomaly ranking, IDF,
  * PMI, Hellinger/TV distances, Burrows' delta stylometry, and the
  * sqrt mixture weights. Discipline as in PinsSampleDqSpec.
  */
class PinsMisc5Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def r(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  private def bd12(x: Double): BigDecimal =
    BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)

  test("profile_benford matches direct log10(1+1/d) expectations") {
    val digits = Tables.orders(spark, sf)
      .select(col("o_totalprice"))
      .collect().map(rr =>
        math.floor(rr.getDouble(0)).toLong.toString.substring(0, 1))
    val byD = digits.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val tot = digits.length.toDouble
    val rows = q("profile_benford").collect()
    assert(rows.length == byD.size)
    for (row <- rows) {
      val d = row.getAs[String]("digit")
      assert(row.getAs[Long]("n") == byD(d))
      assert(math.abs(row.getAs[Double]("obs_share") -
        r(byD(d) / tot, 6)) < 1e-9)
      assert(math.abs(row.getAs[Double]("exp_share") -
        r(math.log10(1.0 + 1.0 / d.toInt), 6)) < 1e-9)
    }
    // Benford expectations over digits 1..9 sum to 1
    assert(math.abs((1 to 9).map(d =>
      math.log10(1.0 + 1.0 / d)).sum - 1.0) < 1e-12)
  }

  test("retention_powerlaw_fit matches a direct log-log OLS fit") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")))
      .collect().map(rr => (rr.getLong(0), rr.getLong(1) / 86400000000L))
      .distinct
    val first = ud.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val nCohort = first.size.toLong
    val nActive = ud.map { case (u, day) => (day - first(u), u) }
      .filter(t => t._1 >= 1 && t._1 <= 30).distinct
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val pts = nActive.toSeq.map { case (k, n) =>
      (bd12(math.log(k.toDouble)),
        bd12(math.log(n.toDouble / nCohort)))
    }
    val np = pts.length
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(p => bd12((p._1 * p._1).toDouble)).sum.toDouble
    val sxy = pts.map(p => bd12((p._1 * p._2).toDouble)).sum.toDouble
    val slope = (np * sxy - sx * sy) / (np * sxx - sx * sx)
    val intercept = (sy - slope * sx) / np
    val row = q("retention_powerlaw_fit").collect().head
    assert(row.getAs[Long]("n_points") == np)
    assert(math.abs(row.getAs[Double]("decay_exponent") - r(slope, 6))
      < 1e-5)
    assert(math.abs(row.getAs[Double]("intercept_ln") - r(intercept, 6))
      < 1e-5)
    // a retention curve decays: the power-law exponent is negative
    assert(slope < 0.0)
  }

  test("event_rate_anomaly matches a direct rolling z-score ranking") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date").cast("string"))
      .collect().map(rr => (rr.getString(0), rr.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((t, day), c) => (t, day, c) }
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (t, g) =>
      val days = g.sortBy(_._2)
      days.indices.flatMap { i =>
        if (i < 28) None
        else {
          val m = (i - 28 until i).map(j => days(j)._3).sum
          val c = days(i)._3
          val num = 28 * c - m
          val score = (BigInt(num) * num * 1000000) / (28 * m)
          Some((t, days(i)._2, c, m, num, score))
        }
      }.sortBy(x => (-x._6, x._2)).take(3).zipWithIndex
        .map { case ((tt, day, c, m, num, _), i) =>
          (tt, (i + 1).toLong, day, c,
            ((m * 10000 + 14) / 28) / 10000.0,
            r(num.toDouble / math.sqrt(28.0 * m), 4))
        }
    }.sortBy(x => (x._1, x._2))
    val rows = q("event_rate_anomaly").collect()
      .map(rr => (rr.getAs[String]("event_type"), rr.getAs[Long]("rk"),
        rr.getAs[java.sql.Date]("day").toString,
        rr.getAs[Long]("n_events"), rr.getAs[Double]("baseline_mean"),
        rr.getAs[Double]("z_score")))
    assert(rows.toSeq == expected)
  }

  test("text_idf_score matches a direct ln(N/df) average") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(rr =>
        (rr.getLong(0), rr.getString(1).split(" ", -1).distinct))
    val nDocs = docs.length.toDouble
    val df = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val rows = q("text_idf_score").collect()
    assert(rows.length == docs.length)
    val byId = docs.toMap
    for (row <- rows) {
      val ws = byId(row.getAs[Long]("doc_id"))
      assert(row.getAs[Long]("n_words") == ws.length)
      val avg = ws.map(w => math.log(nDocs / df(w))).sum / ws.length
      assert(math.abs(row.getAs[Double]("avg_idf") - r(avg, 6)) < 1e-5)
    }
  }

  test("text_pmi matches a direct pointwise-mutual-information top-50") {
    val words = Tables.documents(spark, sf).select(col("text"))
      .collect().map(_.getString(0).split(" ", -1))
    val uni = words.flatten.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val bi = words.flatMap(ws => ws.zip(ws.tail))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._2 >= 5).toMap
    val tTot = uni.values.sum.toDouble
    val bTot = words.map(ws => math.max(ws.length - 1, 0).toLong)
      .sum.toDouble
    val scored = bi.toSeq.map { case ((a, b), cab) =>
      val pmi = math.log((cab / bTot) /
        ((uni(a) / tTot) * (uni(b) / tTot)))
      (a, b, cab, pmi)
    }.sortBy(x => (-x._4, x._1, x._2)).take(50)
    val rows = q("text_pmi").collect()
      .map(rr => (rr.getAs[String]("a"), rr.getAs[String]("b"),
        rr.getAs[Long]("c_ab"), rr.getAs[Double]("pmi")))
    assert(rows.length == scored.length)
    // SET comparison, not positional: two pairs can tie in pmi to the
    // last couple of ulps (measured: 0.2884361660726884 vs ...824),
    // and the float-evaluation order then legitimately swaps their
    // ranks between engines — the driver's comparator is row-order-
    // insensitive for the same reason
    val exp = scored.map(t => (t._1, t._2, t._3)).toSet
    assert(rows.map(t => (t._1, t._2, t._3)).toSet == exp)
    val expPmi = scored.map(t => ((t._1, t._2), t._4)).toMap
    for ((a, b, _, ap) <- rows)
      assert(math.abs(ap - r(expPmi((a, b)), 6)) < 1e-5)
    // the returned list must be pmi-descending (up to rounding)
    val ps = rows.map(_._4)
    assert(ps.zip(ps.tail).forall { case (x, y) => x >= y - 1e-6 })
    // a collocation list's top entries must be POSITIVE associations
    assert(scored.head._4 > 0.0)
  }

  test("mix_weights matches a direct sqrt-weight recomputation") {
    val tok = graft.engine.ml.Bpe
      .tokensStoreFor(Tables.documents(spark, sf), sf)
      .select(col("lang"), col("source"), col("n_tokens"))
      .collect().map(rr => ((rr.getString(0), rr.getString(1)),
        rr.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val wTotal = tok.toSeq.sortBy(_._1)
      .map(t => math.pow(t._2.toDouble, 0.5)).sum
    val rows = q("mix_weights").collect()
    assert(rows.length == tok.size)
    var wsum = 0.0
    for (row <- rows) {
      val k = (row.getAs[String]("lang"), row.getAs[String]("source"))
      assert(row.getAs[Long]("n_tokens") == tok(k))
      val w = r(math.pow(tok(k).toDouble, 0.5) / wTotal, 6)
      assert(math.abs(row.getAs[Double]("weight") - w) < 1.5e-6)
      wsum += row.getAs[Double]("weight")
    }
    assert(math.abs(wsum - 1.0) < 1e-4)
  }

  test("text_hellinger_tv matches direct bounded-distance recomputation") {
    val wc = Tables.documents(spark, sf)
      .select(col("lang"), col("text"))
      .collect().flatMap { rr =>
        val en = rr.getString(0) == "en"
        rr.getString(1).split(" ").filter(_.nonEmpty).map(w => (w, en))
      }
    val hist = wc.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2).toLong, g.count(!_._2).toLong)
    }.toMap
    val ne = hist.values.map(_._1).sum
    val no = hist.values.map(_._2).sum
    val tvs = hist.values
      .map { case (ce, co) => (BigInt(ce) * no - BigInt(co) * ne).abs }
      .sum
    val bs = hist.values
      .map { case (ce, co) =>
        bd12(math.sqrt((BigInt(ce) * co).toDouble))
      }.sum
    val tv = ((tvs * 1000000 + BigInt(ne) * no) /
      (2 * BigInt(ne) * no)).toDouble / 1000000.0
    val bc = math.min(1.0, bs.toDouble / math.sqrt(ne.toDouble * no))
    val row = q("text_hellinger_tv").collect().head
    assert(row.getAs[Long]("vocab_union") == hist.size)
    assert(row.getAs[Double]("tv_distance") == tv)
    assert(math.abs(row.getAs[Double]("bhattacharyya") - r(bc, 6))
      < 1e-5)
    assert(math.abs(row.getAs[Double]("hellinger") -
      r(math.sqrt(math.max(0.0, 1.0 - bc)), 6)) < 1e-5)
    // metric sanity: both distances live in [0, 1]
    assert(tv >= 0.0 && tv <= 1.0)
  }

  test("text_burrows_delta matches a direct stylometric recomputation") {
    val wc = Tables.documents(spark, sf)
      .select(col("source"), col("text"))
      .collect().flatMap { rr =>
        rr.getString(1).split(" ").filter(_.nonEmpty)
          .map(w => (rr.getString(0), w))
      }
    val topw = wc.groupBy(_._2).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(50).map(_._1)
    val sources = wc.map(_._1).distinct.sorted
    val ntok = wc.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val swc = wc.filter(t => topw.contains(t._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    // exact half-up 1e-9-unit relative frequencies
    val fq = (for (s <- sources; w <- topw) yield {
      val c = swc.getOrElse((s, w), 0L)
      ((s, w),
        ((2 * BigInt(c) * 1000000000L + ntok(s)) / (2 * BigInt(ntok(s))))
          .toLong)
    }).toMap
    val zs = topw.flatMap { w =>
      val fs = sources.map(s => fq((s, w)))
      val ns = fs.length.toLong
      val sfr = fs.map(BigInt(_)).sum
      val sff = fs.map(f => BigInt(f) * f).sum
      val den = BigInt(ns) * sff - sfr * sfr
      if (den > 0)
        sources.map(s => ((s, w),
          (fq((s, w)).toDouble * ns - sfr.toDouble) /
            math.sqrt(den.toDouble)))
      else Nil
    }.toMap
    val pairs = for {
      i <- sources.indices; j <- (i + 1) until sources.length
      w <- topw if zs.contains((sources(i), w))
    } yield ((sources(i), sources(j)),
      bd12(math.abs(zs((sources(i), w)) - zs((sources(j), w)))))
    val agg = pairs.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).sum.toDouble / g.length)
    }.toSeq.sortBy { case ((s1, s2), (_, delta)) => (delta, s1, s2) }
      .take(10)
    val rows = q("text_burrows_delta").collect()
      .map(rr => (rr.getAs[String]("s1"), rr.getAs[String]("s2"),
        rr.getAs[Long]("n_words"), rr.getAs[Double]("burrows_delta")))
    assert(rows.length == agg.length)
    for ((((s1, s2), (nw, delta)), (a1, a2, an, ad)) <- agg.zip(rows)) {
      assert((s1, s2, nw) == (a1, a2, an))
      assert(math.abs(ad - r(delta, 6)) < 1e-5)
    }
  }
}
