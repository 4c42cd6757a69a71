package graft

import org.apache.spark.sql.execution.GlobalLimitExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 invariants: the range-partitioned vocab_build id
  * assignment equals the single-task global row_number form, and the
  * plan's only unpartitioned window is the limit(P)-bounded offset
  * table.
  */
class Round10Spec extends AnyFunSuite with SparkFixture {

  test("vocab_build: range-partitioned offsets assign the exact ids " +
      "of the global row_number form") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(lit(1)).orderBy(desc("cnt"), asc("w"))
    val globalForm = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 10)
      .withColumn("vocab_id", row_number().over(w))
      .select("vocab_id", "w", "cnt")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSet
    val got = SparkEntry.queries("vocab_build")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(got.nonEmpty, "empty vocabulary — fixture corpus changed?")
    assert(got === globalForm)
  }

  test("vocab_build: every unpartitioned window in the plan is " +
      "limit-bounded (the offset table), none rank the lexicon") {
    val plan = SparkEntry.queries("vocab_build")(spark, sf)
      .queryExecution.sparkPlan
    val globals = plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globals.nonEmpty,
      "offset table window vanished — re-check the id-assignment plan")
    globals.foreach { w =>
      assert(w.child.collectFirst { case g: GlobalLimitExec => g }
          .nonEmpty,
        "unpartitioned window without a GlobalLimit on its input:\n" +
          w.child.toString.linesIterator.take(6).mkString("\n"))
    }
    // and the lexicon-ranking window must be partition-local
    val locals = plan.collect {
      case w: WindowExec if w.partitionSpec.nonEmpty => w
    }
    assert(locals.nonEmpty, "per-partition rank window vanished")
  }

  test("D-suffixed literal ratios evaluate as IEEE double division " +
      "(the ab_sequential_sprt parity lesson)") {
    // A bare 0.90/0.92 in a Spark expr divides as DECIMALs rounded at
    // scale 6 (ln arg 0.978261), while DuckDB promotes the same text
    // to DOUBLE — the D suffix is what keeps the engines bit-equal.
    val row = spark.range(1).selectExpr(
      "ln(0.90D/0.92D) AS good", "ln(0.90/0.92) AS bare").head()
    assert(row.getDouble(0) === math.log(0.90 / 0.92),
      "D-suffixed ratio no longer matches IEEE double division")
    // pin the hazard itself so a silent Spark behavior change (which
    // would make bare literals safe, or differently unsafe) surfaces
    assert(row.getDouble(1) === math.log(0.978261),
      "bare decimal literal division changed semantics — re-audit " +
        "every literal ratio inside expr strings")
  }

  test("ml_cramers_v: the full-domain chi2 (absent cells rebuilt) " +
      "equals the observed-cells closed form n(sum o^2/(r c) - 1)") {
    // Algebraic identity: sum over the FULL r x c grid of
    // (n o - r c)^2/(n r c) collapses to n (sum_observed o^2/(r c) - 1)
    // — so a driver-side recomputation from the observed cells alone
    // pins the query's domain rebuild (a version that dropped absent
    // cells would break the identity exactly when association is
    // strongest).
    val cells = graft.Tables.documents(spark, sf)
      .select(col("lang").as("st"), col("source").as("pr"))
      .filter(col("st").isNotNull && col("pr").isNotNull)
      .groupBy("st", "pr").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val rm = cells.groupBy(_._1._1).map { case (k, m) => k -> m.values.sum }
    val cm = cells.groupBy(_._1._2).map { case (k, m) => k -> m.values.sum }
    val n = cells.values.sum.toDouble
    val chi2Closed = n * (cells.map { case ((a, b), o) =>
      o.toDouble * o / (rm(a).toDouble * cm(b)) }.sum - 1.0)
    val row = SparkEntry.queries("ml_cramers_v")(spark, sf).head()
    assert(math.abs(row.getAs[Double]("chi2") - chi2Closed) < 1e-4,
      s"chi2 ${row.getAs[Double]("chi2")} != closed form $chi2Closed")
  }

  test("sign-split half-up idiom: a NEGATIVE kappa lands exactly " +
      "(Spark div truncates; the abs/sign split is what keeps it " +
      "floor-equivalent)") {
    // p11=10, p10=90, p01=90, p00=10: po = 0.1, pe = 0.5,
    // kappa = (0.1-0.5)/(1-0.5) = -0.8 exactly.
    val r = spark.range(1)
      .selectExpr("10L AS p11", "90L AS p10", "90L AS p01", "10L AS p00")
      .selectExpr("p11+p10+p01+p00 AS n", "p11+p00 AS agree",
        """CAST(p11 + p10 AS DECIMAL(38,0)) * (p11 + p01)
           + CAST(p01 + p00 AS DECIMAL(38,0)) * (p10 + p00) AS ee""")
      .selectExpr("CAST(n AS DECIMAL(38,0)) * agree - ee AS num",
        "CAST(n AS DECIMAL(38,0)) * n - ee AS den")
      .selectExpr("""CASE WHEN num < 0 THEN -1 ELSE 1 END *
          ((2 * abs(num) * 1000000 + den) div (2 * den))
          / 1000000.0D AS kappa""").head()
    assert(r.getDouble(0) === -0.8,
      s"sign-split idiom returned ${r.getDouble(0)}, expected -0.8")
  }

  test("time_pettitt matches a brute-force driver recomputation " +
      "(midrank tie handling included)") {
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(expr(
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))*100) AS BIGINT)")
        .as("y"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0), r.getLong(1)))
    val n = daily.length
    val ys = daily.map(_._2)
    // s_i = sum_j sign(y_i - y_j); U_t = cumulative sum (the
    // within-prefix pairs cancel by antisymmetry)
    val s = ys.map(yi =>
      ys.map(yj => java.lang.Long.signum(yi - yj).toLong).sum)
    val u = s.scanLeft(0L)(_ + _).drop(1)
    var bi = 0; var bk = -1L
    var i = 0
    while (i < n - 1) {
      val a = math.abs(u(i)); if (a > bk) { bk = a; bi = i }; i += 1
    }
    // independent textbook double-sum at the argmax split point
    val direct = (0 to bi).map(p => ((bi + 1) until n).map(q =>
      java.lang.Long.signum(ys(p) - ys(q)).toLong).sum).sum
    assert(math.abs(direct) === bk,
      "prefix-cumulative U_t diverged from the textbook double sum")
    val row = SparkEntry.queries("time_pettitt")(spark, sf).head()
    assert(row.getAs[Long]("k_stat") === bk,
      s"k_stat ${row.getAs[Long]("k_stat")} != driver $bk")
    assert(row.getAs[java.sql.Date]("change_day").toString ===
      daily(bi)._1.toString, "change day (earliest-argmax) mismatch")
  }

  test("time_seasonal_index_mult: gap-filled windows reproduce a " +
      "driver-side calendar-week recomputation") {
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(expr(
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))*100) AS BIGINT)")
        .as("y"))
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1))).toMap
    val lo = daily.keys.min(Ordering.by((d: java.time.LocalDate) =>
      d.toEpochDay))
    val hi = daily.keys.max(Ordering.by((d: java.time.LocalDate) =>
      d.toEpochDay))
    val days = Iterator.iterate(lo)(_.plusDays(1))
      .takeWhile(!_.isAfter(hi)).toArray
    val ys = days.map(d => daily.getOrElse(d, 0L))
    val byDow = scala.collection.mutable.Map[Int, (Long, Double)]()
      .withDefaultValue((0L, 0.0))
    for (i <- 3 until days.length - 3) {
      val msum = (i - 3 to i + 3).map(ys(_)).sum
      if (msum > 0) {
        val dow = days(i).getDayOfWeek.getValue
        val (c, acc) = byDow(dow)
        byDow(dow) = (c + 1, acc + 7.0 * ys(i) / msum)
      }
    }
    val got = SparkEntry.queries("time_seasonal_index_mult")(spark, sf)
      .collect().map(r => (r.getAs[Int]("dow"),
        r.getAs[Long]("n_days"), r.getAs[Double]("seasonal_index")))
    assert(got.nonEmpty)
    got.foreach { case (dow, nd, idx) =>
      val (c, acc) = byDow(dow)
      assert(nd === c, s"dow $dow n_days $nd != driver $c")
      assert(math.abs(idx - acc / c) < 1e-4,
        s"dow $dow index $idx != driver ${acc / c}")
    }
  }
}
