package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 pin wave from the FIRST MACHINE-RUN formula-marker sweep
  * (`tools/pins_check.py` — the r12 verdict's directive #3): every key
  * the checker flagged with a transcendental / hand-rolled-statistic
  * marker and no recomputation test anywhere in the tree. Discipline
  * as in PinsAbSpec: each statistic is rebuilt from raw sf0.001 rows
  * in plain Scala — never through the query's own algebra — so a
  * formula error shared by the Spark side and its oracle SQL cannot
  * hide behind the parity gate.
  */
class PinsMisc6Spec extends AnyFunSuite with SparkFixture {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** First 8 hex chars of md5 as an unsigned long — the repo's
    * deterministic draw (conv(substring(md5(s),1,8),16,10)). */
  private def md5b(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  /** Spark ROUND(double, s) — HALF_UP on the shortest decimal repr. */
  private def rnd(x: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()

  /** CAST(double AS DECIMAL(p,s)) — HALF_UP quantization, kept exact. */
  private def dec(x: Double, s: Int): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP))

  /** Left-fold dot product in index order — the engines' shared form. */
  private def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def cos(a: Seq[Float], b: Seq[Float]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  private lazy val embRows: Array[(Long, Long, Seq[Float])] =
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2)))

  /** One probe per label: MIN(vec_id), the Similarity.probes contract. */
  private lazy val probeIds: Set[Long] =
    embRows.groupBy(_._2).map { case (_, g) => g.map(_._1).min }.toSet

  // -------------------------------------------------------------- mix

  test("mix_ess matches a direct (sum w)^2 / sum w^2 recomputation") {
    val cells = Tables.documents(spark, sf)
      .select(col("lang"), col("source")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = cells.values.sum
    val si = cells.view.mapValues(c => dec(math.sqrt(c.toDouble), 6)).toMap
    val stot = si.values.sum
    var sw1 = BigDecimal(0); var sw2 = BigDecimal(0)
    for ((cell, c) <- cells) {
      val w = (si(cell).toDouble / stot.toDouble) * (n.toDouble / c)
      sw1 += dec(rnd(c * w, 12), 12)
      sw2 += dec(rnd(c * (w * w), 12), 12)
    }
    val ess = rnd(sw1.toDouble * sw1.toDouble / sw2.toDouble, 2)
    val ratio = rnd(sw1.toDouble * sw1.toDouble / sw2.toDouble / n, 6)
    val row = q("mix_ess").collect().head
    assert(row.getAs[Long]("n_docs") == n)
    assert(row.getAs[Long]("n_cells") == cells.size)
    assert(math.abs(row.getAs[Double]("ess") - ess) < 1e-6)
    assert(math.abs(row.getAs[Double]("ess_ratio") - ratio) < 1e-9)
  }

  test("mix_epochs matches a direct water-filling replay") {
    val toks = graft.engine.ml.Bpe
      .tokensStoreFor(Tables.documents(spark, sf), sf)
      .select(col("lang"), col("source"), col("n_tokens")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Number](2).longValue))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val si = toks.view.mapValues(t => dec(math.sqrt(t.toDouble), 6)).toMap
    val denom = si.values.sum
    val total = toks.values.sum
    val budget = math.floor(total.toDouble * 1.2).toLong
    val alloc0 = toks.map { case (k, _) =>
      k -> math.floor((si(k).toDouble / denom.toDouble) * budget).toLong }
    val cap = toks.view.mapValues(_ * 2L).toMap
    // .toSeq before map: Map#keys is a Set, and mapping a Set through
    // si DEDUPLICATES equal values before the sum (two domains with
    // identical token counts collapsed to one s_i — measured 139 off)
    val keys = toks.keys.toSeq
    val excess = keys.map(k => math.max(0L, alloc0(k) - cap(k))).sum
    val uDenom = keys.filter(k => alloc0(k) <= cap(k)).map(si).sum
    val rows = q("mix_epochs").collect()
    assert(rows.length == toks.size)
    for (r <- rows) {
      val k = (r.getString(0), r.getString(1))
      val fin =
        if (alloc0(k) > cap(k)) cap(k)
        else alloc0(k) + math.floor(excess.toDouble *
          (si(k).toDouble / uDenom.toDouble)).toLong
      assert(r.getAs[Long]("n_tokens") == toks(k))
      assert(r.getAs[Long]("alloc0") == alloc0(k))
      assert(r.getAs[Boolean]("capped") == (alloc0(k) > cap(k)))
      assert(r.getAs[Long]("alloc_final") == fin)
      assert(math.abs(r.getAs[Double]("epochs") -
        rnd(fin.toDouble / toks(k), 4)) < 1e-9)
    }
    // the cap must genuinely bind on at least one tail domain —
    // otherwise the water-filling branch is dead code in the fixture
    assert(rows.exists(_.getAs[Boolean]("capped")))
  }

  // --------------------------------------------------------------- dq

  test("dq_bot_sessions matches direct rate and gap-std recomputation") {
    val organic = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts"))).collect()
      // the query computes (unix_micros / 1000000L).cast("long"):
      // Spark's `/` on longs is DOUBLE division, then the cast
      // truncates — mirror that exact route, not integer division
      .map(r => (r.getLong(0), (r.getLong(1).toDouble / 1000000.0).toLong))
    val bot = (0 until 120).map(i => (-1L, 800000000L + i))
    val expected = (organic ++ bot).groupBy(_._1).flatMap {
      case (uid, rs) =>
        val ts = rs.map(_._2).sorted
        val nEvents = ts.length.toLong
        val span = ts.last - ts.head
        val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
        val ng = gaps.length.toLong
        if (span <= 0 || ng <= 1) None
        else {
          val sg = gaps.sum
          val sg2 = gaps.map(g => g * g).sum
          val rate = ((nEvents * 600000L + span / 2) / span).toDouble / 10000.0
          val std = math.sqrt(math.max(0.0,
            (ng * sg2 - sg * sg).toDouble / (ng * (ng - 1))))
          if (rate >= 30.0 && std < 2.0)
            Some(uid -> (nEvents, span, rate, rnd(std, 4) + 0.0))
          else None
        }
    }
    val rows = q("dq_bot_sessions").collect()
    assert(rows.length == expected.size)
    assert(expected.contains(-1L), "planted bot must survive the filter")
    for (r <- rows) {
      val (n, span, rate, std) = expected(r.getLong(0))
      assert(r.getAs[Long]("n_events") == n)
      assert(r.getAs[Long]("span_s") == span)
      assert(r.getAs[Double]("rate_pm") == rate)
      assert(math.abs(r.getAs[Double]("gap_std") - std) < 1e-9)
    }
  }

  // ----------------------------------------------------------- sample

  test("sample_weighted matches the direct A-Res pow(u, 1/w) keys") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keyed = docs.map { case (id, nc) =>
      val u = (md5b(id.toString).toDouble + 1.0) / 4294967296.0
      (id, rnd(math.pow(u, 1.0 / nc), 12))
    }
    val top = keyed.sortBy { case (id, k) => (-k, id) }.take(100)
    val rows = q("sample_weighted").collect()
    assert(rows.length == top.length)
    val got = rows.map(r => (r.getLong(0), r.getAs[Double]("key"))).toMap
    for ((id, k) <- top) {
      assert(got.contains(id), s"doc $id missing from the sample")
      assert(math.abs(got(id) - k) < 1e-12)
    }
  }

  // ------------------------------------------------------------- text

  test("text_keywords matches direct tf*ln(N/df) top-3 extraction") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tok = docs.flatMap { case (id, t) =>
      t.split(" ", -1).map(w => (id, w)) }
    val tf = tok.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val df = tok.distinct.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nDocs = docs.length.toDouble
    val expected = tf.toSeq
      .map { case ((id, w), c) =>
        (id, w, rnd(c * math.log(nDocs / df(w)), 6)) }
      .groupBy(_._1).view.mapValues { ts =>
        ts.sortBy(t => (-t._3, t._2)).take(3).zipWithIndex
          .map { case ((_, w, s), i) => (i + 1, w, s) }
      }.toMap
    val rows = q("text_keywords").collect()
    assert(rows.length == expected.values.map(_.length).sum)
    for (r <- rows) {
      val terms = expected(r.getLong(0))
      val (rk, w, s) = terms(r.getInt(1) - 1)
      assert(rk == r.getInt(1) && w == r.getString(2))
      assert(math.abs(r.getDouble(3) - s) < 1e-9)
    }
  }

  test("text_lm_score matches a direct avg ln(c/t) unigram LM") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tok = docs.flatMap { case (id, t) =>
      t.split(" ", -1).map(w => (id, w)) }
    val cnt = tok.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val total = tok.length.toDouble
    val rows = q("text_lm_score").collect()
    assert(rows.length == docs.length)
    val byDoc = tok.groupBy(_._1)
    for (r <- rows) {
      val ws = byDoc(r.getLong(0)).map(_._2)
      val lm = rnd(ws.map(w => math.log(cnt(w) / total)).sum / ws.length, 6)
      assert(r.getAs[Long]("n_tokens") == ws.length)
      assert(math.abs(r.getAs[Double]("lm_score") - lm) < 1e-6)
    }
  }

  test("text_bigram_lm matches the direct add-half smoothed bigram LM") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val docBi = docs.flatMap { case (id, ws) =>
      ws.zip(ws.drop(1)).map { case (a, b) => (id, a, b) } }
    val biC = docBi.groupBy(t => (t._2, t._3)).view
      .mapValues(_.length.toLong).toMap
    val uniC = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val v = uniC.size.toLong
    val rows = q("text_bigram_lm").collect()
    val byDoc = docBi.groupBy(_._1)
    assert(rows.length == byDoc.size)
    for (r <- rows) {
      val bs = byDoc(r.getLong(0))
      val lps = bs.map { case (_, a, b) =>
        dec(math.log((biC((a, b)) + 0.5) / (uniC(a) + 0.5 * v)), 9) }
      val score = rnd(lps.sum.toDouble / bs.length, 6)
      assert(r.getAs[Long]("n_bigrams") == bs.length)
      assert(math.abs(r.getAs[Double]("lm_score") - score) < 1e-6)
    }
  }

  test("text_source_similarity matches direct hashed-profile cosines") {
    val vecs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .flatMap { r =>
        r.getString(1).toLowerCase.split("[^a-z]+", -1)
          .filter(_.nonEmpty)
          .map(tok => (r.getString(0),
            java.lang.Long.parseLong(md5hex(tok).substring(0, 4), 16) % 256))
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bySource = vecs.groupBy(_._1._1).view
      .mapValues(_.map { case ((_, b), c) => (b, c) }.toMap).toMap
    val norms = bySource.view.mapValues(m =>
      m.values.map(c => c * c).sum).toMap
    val rows = q("text_source_similarity").collect()
    val sources = bySource.keys.toSeq.sorted
    assert(rows.length == sources.combinations(2).size)
    for (r <- rows) {
      val (a, b) = (r.getString(0), r.getString(1))
      val dotAb = bySource(a).map { case (k, ca) =>
        ca * bySource(b).getOrElse(k, 0L) }.sum
      val c = rnd(dotAb.toDouble /
        (math.sqrt(norms(a).toDouble) * math.sqrt(norms(b).toDouble)), 6) + 0.0
      assert(math.abs(r.getAs[Double]("cosine") - c) < 1e-9)
    }
  }

  // ---------------------------------------------- vec ranking metrics

  /** Per-probe top-5 by (cos desc, vec_id asc), self excluded. */
  private def top5For(probe: (Long, Long, Seq[Float])) = {
    val (pid, _, pemb) = probe
    embRows.filter(_._1 != pid)
      .map { case (vid, lab, e) => (vid, lab, cos(pemb, e)) }
      .sortBy { case (vid, _, c) => (-c, vid) }.take(5)
  }

  test("vec_ndcg_at_k literals equal 1/log2(r+1) and ndcg matches") {
    val w = Array(1.000000000000, 0.630929753571, 0.500000000000,
      0.430676558073, 0.386852807235)
    for (r <- 1 to 5)
      assert(math.abs(w(r - 1) - 1.0 / (math.log(r + 1) / math.log(2)))
        < 5e-13, s"DCG discount literal for rank $r is wrong")
    val labelOf = embRows.map(t => t._1 -> t._2).toMap
    val nRel = embRows.groupBy(_._2).view.mapValues(_.length - 1).toMap
    val rows = q("vec_ndcg_at_k").collect()
    assert(rows.length == probeIds.size)
    for (r <- rows) {
      val pid = r.getLong(0)
      val probe = embRows.find(_._1 == pid).get
      val dcg = top5For(probe).zipWithIndex.collect {
        case ((_, lab, _), i) if lab == probe._2 => dec(w(i), 12)
      }.sum
      val idcg = (1 to math.min(5, math.max(1, nRel(probe._2))))
        .map(i => dec(w(i - 1), 12)).sum
      assert(math.abs(r.getAs[Double]("dcg") - rnd(dcg.toDouble, 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("ndcg") -
        (rnd(dcg.toDouble / idcg.toDouble, 6) + 0.0)) < 1e-9)
    }
  }

  test("vec_mrr matches the exact 60-based reciprocal-rank rationals") {
    val ranks = probeIds.toSeq.map { pid =>
      val probe = embRows.find(_._1 == pid).get
      top5For(probe).zipWithIndex.collectFirst {
        case ((_, lab, _), i) if lab == probe._2 => i + 1
      }
    }
    val p = ranks.length.toLong
    val hits = ranks.count(_.isDefined).toLong
    val rr60 = ranks.flatten.map(r => 60L / r).sum
    val mrr = ((BigInt(2) * rr60 * 1000000 + 60 * p) /
      (120 * p)).toDouble / 1000000.0
    val hitRate = ((BigInt(2) * hits * 1000000 + p) /
      (2 * p)).toDouble / 1000000.0
    val row = q("vec_mrr").collect().head
    assert(row.getAs[Long]("n_probes") == p)
    assert(row.getAs[Long]("hits_at_5") == hits)
    assert(row.getAs[Double]("mrr") == mrr)
    assert(row.getAs[Double]("hit_rate") == hitRate)
  }

  test("vec_precision_at_k matches direct label-match counts") {
    val rows = q("vec_precision_at_k").collect()
    assert(rows.length == probeIds.size)
    for (r <- rows) {
      val probe = embRows.find(_._1 == r.getLong(0)).get
      val m = top5For(probe).count(_._2 == probe._2).toLong
      assert(r.getAs[Long]("n_match") == m)
      assert(r.getAs[Double]("p_at_5") == m / 5.0)
    }
  }

  // -------------------------------------------------- vec transforms

  /** The repo's seeded JL sign: +1 iff the first md5 nibble of
    * "i_j" is even (i is the 0-based input dim). */
  private def jlSign(i: Int, j: Int): Double =
    if (Integer.parseInt(md5hex(s"${i}_$j").substring(0, 1), 16) % 2 == 0)
      1.0 else -1.0

  test("vec_project matches a direct signed-sum JL projection") {
    val rows = q("vec_project").collect()
    assert(rows.length == embRows.length * 8)
    val byVec = embRows.map(t => t._1 -> t._3).toMap
    for (r <- rows.take(400)) { // 50 vectors' worth — plenty of teeth
      val emb = byVec(r.getLong(0))
      val j = r.getAs[Number]("j").intValue
      val s = emb.indices.map(i =>
        dec(emb(i).toDouble * jlSign(i, j), 9)).sum
      val comp = rnd(s.toDouble / math.sqrt(8.0), 6)
      assert(math.abs(r.getAs[Double]("comp") - comp) < 1e-9)
    }
  }

  test("vec_jl_distortion matches direct distance-ratio recomputation") {
    val probes = embRows.filter(t => probeIds(t._1))
      .sortBy(_._1).map(t => (t._1, t._3))
    val proj = probes.map { case (pid, e) =>
      pid -> (0 until 8).map { j =>
        e.indices.map(i => dec(e(i).toDouble * jlSign(i, j), 9))
          .sum.toDouble / math.sqrt(8.0)
      }
    }.toMap
    val rows = q("vec_jl_distortion").collect()
    assert(rows.length == probes.length * (probes.length - 1) / 2)
    for (r <- rows) {
      val (pa, pb) = (r.getLong(0), r.getLong(1))
      val ea = probes.find(_._1 == pa).get._2
      val eb = probes.find(_._1 == pb).get._2
      val d2o = ea.indices.map { i =>
        val d = ea(i).toDouble - eb(i).toDouble; dec(d * d, 12) }.sum
      val d2p = (0 until 8).map { j =>
        val d = proj(pa)(j) - proj(pb)(j); dec(d * d, 12) }.sum
      assert(math.abs(r.getAs[Double]("d2_orig") - rnd(d2o.toDouble, 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("d2_proj") - rnd(d2p.toDouble, 6)) < 1e-9)
      assert(math.abs(r.getAs[Double]("ratio") -
        rnd(d2p.toDouble / d2o.toDouble, 4)) < 1e-9)
    }
  }

  test("vec_standardize matches direct per-dimension moment formulas") {
    val rows = q("vec_standardize").collect()
    assert(rows.length == 64)
    val n = embRows.length.toLong
    for (r <- rows) {
      val i = r.getAs[Number]("i").intValue
      val vs = embRows.map(_._3(i - 1).toDouble)
      val sv = vs.map(v => dec(v, 12)).sum
      val svv = vs.map(v => dec(v * v, 12)).sum
      val mean = rnd(sv.toDouble / n, 8)
      val std = rnd(math.sqrt((n * svv.toDouble -
        sv.toDouble * sv.toDouble) / (n.toDouble * n)), 8)
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("mean_r") - mean) < 1e-9)
      assert(math.abs(r.getAs[Double]("std_r") - std) < 1e-9)
    }
  }

  test("vec_quantize matches direct int8 scale / code-sum / mse") {
    val rows = q("vec_quantize").collect()
    assert(rows.length == embRows.length)
    val byVec = embRows.map(t => t._1 -> t._3).toMap
    def sparkRound(x: Double): Long =
      java.math.BigDecimal.valueOf(x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    for (r <- rows.take(100)) {
      val e = byVec(r.getLong(0))
      val scale = e.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max) / 127.0
      val codes = e.map(x => sparkRound(x.toDouble / scale))
      val absSum = codes.map(math.abs).sum
      var mse = 0.0
      for (i <- e.indices) {
        val err = e(i).toDouble - codes(i) * scale
        mse += err * err
      }
      assert(math.abs(r.getAs[Double]("scale_r") - rnd(scale, 8)) < 1e-12)
      assert(r.getAs[Long]("abs_code_sum") == absSum)
      assert(math.abs(r.getAs[Double]("mse") - rnd(mse / 64.0, 12)) < 1e-12)
    }
  }

  test("vec_residual_error matches direct two-stage residual MSE") {
    val byLabel = embRows.groupBy(_._2)
    val cvecs = byLabel.view.mapValues { g =>
      (0 until 64).map { i =>
        g.map(t => dec(t._3(i).toDouble, 10)).sum.toDouble / g.length }
    }.toMap
    val rows = q("vec_residual_error").collect()
    assert(rows.length == byLabel.size)
    for (r <- rows) {
      val lab = r.getAs[Number]("label").longValue
      val g = byLabel(lab)
      val c = cvecs(lab)
      var sse0 = BigDecimal(0); var sse1 = BigDecimal(0)
      for ((_, _, e) <- g) {
        var s0 = 0.0; var rmax = 0.0
        for (i <- 0 until 64) {
          val d = e(i).toDouble - c(i)
          s0 += d * d
          rmax = math.max(rmax, math.abs(d))
        }
        val rscale = rmax / 127.0
        var s1 = 0.0
        for (i <- 0 until 64) {
          val d = e(i).toDouble - c(i)
          // Spark SQL round(double) is HALF_UP, not rint/half-even
          val code = java.math.BigDecimal.valueOf(d / rscale)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
          val err = d - code * rscale
          s1 += err * err
        }
        sse0 += dec(s0, 12); sse1 += dec(s1, 12)
      }
      assert(r.getAs[Long]("n_vecs") == g.length)
      assert(math.abs(r.getAs[Double]("mse_stage0") -
        rnd(sse0.toDouble / (g.length * 64), 12)) < 1e-10)
      assert(math.abs(r.getAs[Double]("mse_stage1") -
        rnd(sse1.toDouble / (g.length * 64), 12)) < 1e-10)
    }
  }
}
