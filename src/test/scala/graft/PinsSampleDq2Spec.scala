package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 second pins wave — the remaining formula-bearing mix_ /
  * dq_ / vocab_ keys (z-scores, OLS slope, Heaps exponents,
  * temperature weights, power-law allocation, quantile-bucketed
  * sampling). Same discipline as PinsSampleDqSpec: every statistic
  * rebuilt from raw sf0.001 rows (or, for the two token-store keys,
  * from the persisted BPE token counts that BpeSpec pins separately)
  * in plain Scala.
  */
class PinsSampleDq2Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5b(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16)
  }

  private def r(x: Double, scale: Int): Double =
    BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  test("dq_anomaly matches a direct daily-count z-score") {
    val days = Tables.events(spark, sf)
      .select(date_trunc("DAY", col("ts")).cast("date").cast("string"))
      .collect().map(_.getString(0))
    val daily = days.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val k = daily.size.toLong
    val s1 = daily.values.sum
    val s2 = daily.values.map(n => n * n).sum
    val mean = s1.toDouble / k
    val sd = math.sqrt((s2.toDouble - s1.toDouble * s1 / k) / (k - 1))
    val rows = q("dq_anomaly").collect()
    assert(rows.length == daily.size)
    for (row <- rows) {
      val n = daily(row.getAs[java.sql.Date]("day").toString)
      assert(row.getAs[Long]("n") == n)
      val z = (n - mean) / sd
      assert(math.abs(row.getAs[Double]("z") - r(z, 4)) < 1e-9)
      assert(row.getAs[Boolean]("is_anomaly") == (math.abs(z) > 2))
    }
  }

  test("dq_completeness_trend matches a direct planted-decay OLS slope") {
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long"))
      .collect().map(rr => (rr.getLong(0), rr.getLong(1)))
    val m0 = o.map(_._2).min
    val monthly = o.groupBy(t => (t._2 - m0).toInt).view.mapValues { g =>
      val miss = g.count { case (k, ym) =>
        md5b(k.toString) % 1000 < 5 * (ym - m0)
      }
      (g.length.toLong, miss.toLong)
    }.toMap
    // exact 1e6-unit half-up rate, then exact BIGINT OLS moments
    val pts = monthly.toSeq.map { case (m, (n, miss)) =>
      (m.toLong, (miss * 1000000L + n / 2) / n)
    }
    val nm = pts.length.toLong
    val sx = pts.map(_._1).sum
    val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = r((nm.toDouble * sxy - sx.toDouble * sy) /
      (nm.toDouble * sxx - sx.toDouble * sx) / 1e6, 8)
    val rows = q("dq_completeness_trend").collect()
    assert(rows.length == monthly.size)
    for (row <- rows) {
      val m = row.getAs[Int]("month_idx")
      val (n, miss) = monthly(m)
      assert(row.getAs[Long]("n_rows") == n)
      assert(row.getAs[Long]("n_missing") == miss)
      assert(row.getAs[Double]("missing_rate") ==
        ((miss * 1000000L + n / 2) / n) / 1e6)
      assert(math.abs(row.getAs[Double]("slope_per_month") - slope)
        < 1e-9)
    }
    // planted decay is increasing by construction: slope must be > 0
    assert(slope > 0.0)
  }

  test("vocab_heaps_law matches direct nested-sample Heaps exponents") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().flatMap { rr =>
        val b = md5b(rr.getLong(0).toString) % 100
        rr.getString(1).split(" ").filter(_.nonEmpty).map(w => (b, w))
      }
    def nv(cut: Long) = {
      val in = toks.filter(_._1 < cut)
      (in.length.toLong, in.map(_._2).distinct.length.toLong)
    }
    val (n1, v1) = nv(1)
    val (n10, v10) = nv(10)
    val (n100, v100) = (toks.length.toLong,
      toks.map(_._2).distinct.length.toLong)
    val row = q("vocab_heaps_law").collect().head
    assert(row.getAs[Long]("n1") == n1 && row.getAs[Long]("v1") == v1)
    assert(row.getAs[Long]("n10") == n10 && row.getAs[Long]("v10") == v10)
    assert(row.getAs[Long]("n100") == n100 &&
      row.getAs[Long]("v100") == v100)
    val bSmall = r(math.log(v10.toDouble / v1) /
      math.log(n10.toDouble / n1), 4)
    val bLarge = r(math.log(v100.toDouble / v10) /
      math.log(n100.toDouble / n10), 4)
    assert(math.abs(row.getAs[Double]("beta_small") - bSmall) < 1e-9)
    assert(math.abs(row.getAs[Double]("beta_large") - bLarge) < 1e-9)
    // Heaps' law: vocabulary grows sublinearly in corpus size
    assert(bLarge > 0.0 && bLarge < 1.0)
  }

  test("mix_temperature matches a direct sqrt-temperature reweighting") {
    val tok = graft.engine.ml.Bpe
      .tokensStoreFor(Tables.documents(spark, sf), sf)
      .select(col("lang"), col("source"), col("n_tokens"))
      .collect().map(rr => ((rr.getString(0), rr.getString(1)),
        rr.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val sI = tok.map { case (k, n) =>
      (k, BigDecimal(math.sqrt(n.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    }
    val denom = sI.values.sum.toDouble
    val tokTotal = tok.values.sum.toDouble
    val rows = q("mix_temperature").collect()
    assert(rows.length == tok.size)
    for (row <- rows) {
      val k = (row.getAs[String]("lang"), row.getAs[String]("source"))
      assert(row.getAs[Long]("n_tokens") == tok(k))
      val w = sI(k).toDouble / denom
      assert(math.abs(row.getAs[Double]("w_temp") - r(w, 6)) < 1e-9)
      val boost = w / (tok(k) / tokTotal)
      assert(math.abs(row.getAs[Double]("boost") - r(boost, 4)) < 1e-9)
      // sqrt temperature boosts SMALL domains (boost > 1 iff the
      // domain is smaller than the mix average in the s_i sense)
    }
    // weights sum to ~1
    assert(math.abs(rows.map(_.getAs[Double]("w_temp")).sum - 1.0)
      < 1e-4)
  }

  test("mix_allocate matches a direct power-law budget allocation") {
    val tok = graft.engine.ml.Bpe
      .tokensStoreFor(Tables.documents(spark, sf), sf)
      .select(col("lang"), col("source"), col("n_tokens"))
      .collect().map(rr => ((rr.getString(0), rr.getString(1)),
        rr.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // deterministic summation order: both this sum and Spark's
    // SUM(pow(...)) are floating adds, so the recomputed weight is
    // compared at the 6-decimal rounding granularity (1.5e-6), not at
    // 1e-9 — a half-up boundary within 1 ulp of the sum order must
    // not flip the pin (code-review r12)
    val wTotal = tok.toSeq.sortBy(_._1)
      .map(t => math.pow(t._2.toDouble, 0.5)).sum
    val rows = q("mix_allocate").collect()
    assert(rows.length == tok.size)
    for (row <- rows) {
      val k = (row.getAs[String]("lang"), row.getAs[String]("source"))
      val n = tok(k)
      val weight = r(math.pow(n.toDouble, 0.5) / wTotal, 6)
      assert(row.getAs[Long]("n_tokens") == n)
      assert(math.abs(row.getAs[Double]("weight") - weight) < 1.5e-6)
      // alloc/epochs pinned against the query's OWN rounded weight
      // (exact integer relation), plus the recomputed weight above
      val sparkW = row.getAs[Double]("weight")
      val alloc = math.floor(sparkW * 1000000L).toLong
      assert(row.getAs[Long]("alloc_tokens") == alloc)
      assert(math.abs(row.getAs[Double]("epochs") -
        r(alloc.toDouble / n, 4)) < 1e-9)
    }
  }

  test("mix_by_quality matches a direct quartile-bucket keep count") {
    val stop = Set("join", "filter", "sort", "hash", "scan")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map { rr =>
        val ws = rr.getString(1).split(" ", -1)
        val quality = r(math.min(1.0, ws.length / 200.0) *
          (1.0 - ws.count(stop).toDouble / ws.length), 4)
        (rr.getLong(0), quality)
      }
    // linear-interpolation quartiles (percentile/quantile_cont parity)
    val sorted = docs.map(_._2).sorted
    def pctl(p: Double): Double = {
      val h = (sorted.length - 1) * p
      val lo = h.toInt
      if (lo + 1 >= sorted.length) sorted(lo)
      else sorted(lo) + (h - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val (q1, q2, q3) = (pctl(0.25), pctl(0.5), pctl(0.75))
    val buckets = docs.map { case (id, quality) =>
      val b = if (quality <= q1) 1 else if (quality <= q2) 2
        else if (quality <= q3) 3 else 4
      val rate = Seq(10, 25, 50, 100)(b - 1)
      (b, if (md5b(id.toString) % 100 < rate) 1L else 0L)
    }
    val byB = buckets.groupBy(_._1)
    val rows = q("mix_by_quality").collect()
    assert(rows.length == byB.size)
    for (row <- rows) {
      val g = byB(row.getAs[Int]("bucket"))
      assert(row.getAs[Long]("n_docs") == g.length)
      assert(row.getAs[Long]("n_kept") == g.map(_._2).sum)
    }
    // the downsampling must actually thin the low buckets
    val kept1 = byB(1).map(_._2).sum.toDouble / byB(1).length
    val kept4 = byB(4).map(_._2).sum.toDouble / byB(4).length
    assert(kept1 < kept4)
  }

  test("sample_importance matches a direct inverse-probability weight") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars").cast("long"))
      .collect().map(rr => (rr.getLong(0), rr.getString(1), rr.getLong(2)))
    val expected = docs.flatMap { case (id, lang, nc) =>
      val pKeep = math.min(nc.toDouble / 2000.0, 1.0)
      val u = md5b(s"imp:$id").toDouble / 4294967296.0
      if (u < pKeep) {
        val htE6 = if (nc >= 2000L) 1000000L
          else (2000L * 1000000L + nc / 2) / nc
        Some((id, lang, nc, r(pKeep, 6), htE6 / 1000000.0))
      } else None
    }
    val rows = q("sample_importance").collect()
      .map(rr => (rr.getAs[Long]("doc_id"), rr.getAs[String]("lang"),
        rr.getAs[Long]("n_chars"), rr.getAs[Double]("p_keep"),
        rr.getAs[Double]("ht_weight")))
    assert(rows.toSeq == expected.toSeq.sortBy(_._1))
    // HT property: weights are >= 1 (inverse of a probability)
    assert(rows.forall(_._5 >= 1.0 - 1e-12))
  }

  test("sample_time_folds matches direct expanding-window counts") {
    val rel = Tables.orders(spark, sf)
      .select((year(col("o_orderdate")) * 12 +
        month(col("o_orderdate")) - 1 - 1995 * 12).cast("long"))
      .collect().map(_.getLong(0))
    val rows = q("sample_time_folds").collect()
    assert(rows.length == 4)
    for (rr <- rows) {
      val f = rr.getAs[Int]("fold")
      val trainEnd = 24 + f * 12
      val validEnd = 30 + f * 12
      assert(rr.getAs[Int]("train_end") == trainEnd)
      assert(rr.getAs[Int]("valid_end") == validEnd)
      assert(rr.getAs[Long]("train_rows") ==
        rel.count(_ < trainEnd).toLong)
      assert(rr.getAs[Long]("valid_rows") ==
        rel.count(x => x >= trainEnd && x < validEnd).toLong)
    }
    // expanding window: train sets never shrink across folds
    val tr = rows.sortBy(_.getAs[Int]("fold")).map(_.getAs[Long]("train_rows"))
    assert(tr.zip(tr.tail).forall { case (a, b) => a <= b })
  }

  test("mix_token_budget matches a direct greedy band fill") {
    val stop = Set("join", "filter", "sort", "hash", "scan")
    val docs = Tables.documents(spark, sf).select(col("text"))
      .collect().map { rr =>
        val ws = rr.getString(0).split(" ", -1)
        val quality = r(math.min(1.0, ws.length / 200.0) *
          (1.0 - ws.count(stop).toDouble / ws.length), 4)
        (math.floor(quality * 20.0).toInt, ws.length.toLong)
      }
    val bands = docs.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.map(_._2).sum)
    }.toMap
    val total = bands.values.map(_._2).sum
    val budget = total * 2 / 5
    val ordered = bands.toSeq.sortBy(-_._1)
    var cum = 0L
    val expected = ordered.map { case (band, (n, toks)) =>
      cum += toks
      val status = if (cum <= budget) "full"
        else if (cum - toks < budget) "boundary" else "excluded"
      (band, n, toks, cum, budget, status)
    }
    val rows = q("mix_token_budget").collect()
      .map(rr => (rr.getAs[Int]("band"), rr.getAs[Long]("n_docs"),
        rr.getAs[Long]("band_tokens"), rr.getAs[Long]("cum_tokens"),
        rr.getAs[Long]("budget"), rr.getAs[String]("status")))
    assert(rows.toSeq == expected)
    // exactly one boundary band unless a band edge hits the budget
    assert(rows.count(_._6 == "boundary") <= 1)
  }
}
