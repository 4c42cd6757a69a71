package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 invariants: the histogram/contingency formulations of the
  * nonparametric statistics equal their textbook single-window /
  * pair-enumeration forms, and the plans stay domain-sized. */
class Round9Spec extends AnyFunSuite with SparkFixture {

  test("ml_spearman_corr: histogram-midrank form equals corr over " +
      "textbook per-group midranks") {
    import org.apache.spark.sql.expressions.Window
    val base = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
    // textbook: avg rank over ties via rank() + (count-1)/2
    def mid(c: String) = {
      val w = Window.partitionBy("g").orderBy(c)
      val cw = Window.partitionBy("g", c)
      rank().over(w) + (count(lit(1)).over(cw) - 1) / 2.0
    }
    val textbook = base
      .withColumn("rx", mid("x")).withColumn("ry", mid("y"))
      .groupBy("g").agg(round(corr(col("rx"), col("ry")), 6).as("rho"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = SparkEntry.queries("ml_spearman_corr")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet === textbook.keySet)
    got.foreach { case (g, rho) =>
      assert(math.abs(rho - textbook(g)) <= 2e-6, s"group $g")
    }
  }

  test("ml_kendall_tau: contingency form equals direct pair " +
      "enumeration on a sample") {
    import spark.implicits._
    // direct O(n²) enumeration is the definition — run it on a small
    // deterministic sample and compare against the contingency form
    // computed over the SAME sample rows
    val sample = graft.Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("long").as("x"),
        (col("l_discount") * 100).cast("long").as("y"))
      .filter(pmod(xxhash64(col("x"), col("y")), lit(37)) === 0)
      .limit(300).collect().map(r => (r.getLong(0), r.getLong(1)))
    var conc = 0L; var disc = 0L
    for (i <- sample.indices; j <- (i + 1) until sample.length) {
      val sx = java.lang.Long.compare(sample(j)._1, sample(i)._1)
      val sy = java.lang.Long.compare(sample(j)._2, sample(i)._2)
      if (sx * sy > 0) conc += 1 else if (sx * sy < 0) disc += 1
    }
    val cells = sample.toSeq.toDF("x", "y")
      .groupBy("x", "y").agg(count(lit(1)).as("cnt"))
    val a = cells.select(col("x").as("ax"), col("y").as("ay"),
      col("cnt").as("an"))
    val b = cells.select(col("x").as("bx"), col("y").as("by"),
      col("cnt").as("bn"))
    val p = a.crossJoin(b)
    val gotC = p.filter(col("bx") > col("ax") && col("by") > col("ay"))
      .agg(coalesce(sum(col("an") * col("bn")), lit(0L)))
      .collect()(0).getLong(0)
    val gotD = p.filter(col("bx") > col("ax") && col("by") < col("ay"))
      .agg(coalesce(sum(col("an") * col("bn")), lit(0L)))
      .collect()(0).getLong(0)
    assert(gotC === conc, "concordant")
    assert(gotD === disc, "discordant")
  }

  test("ab_mann_whitney: histogram rank-sum equals the textbook " +
      "single-window midrank U") {
    import org.apache.spark.sql.expressions.Window
    val pu = graft.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT)"))
        .as("cents"))
      .select(col("cents"), (col("user_id") % 2).as("arm"))
    val w = Window.orderBy("cents")
    val cw = Window.partitionBy("cents")
    val ranked = pu.withColumn("mr",
      rank().over(w) + (count(lit(1)).over(cw) - 1) / 2.0)
    val r1 = ranked.filter(col("arm") === 1)
      .agg(sum(col("mr")).as("r1"), count(lit(1)).as("n1"))
      .collect()(0)
    val u1Textbook = r1.getDouble(0) - r1.getLong(1) *
      (r1.getLong(1) + 1) / 2.0
    val got = SparkEntry.queries("ab_mann_whitney")(spark, sf)
      .collect()(0)
    assert(got.getDouble(2) === u1Textbook, "U1")
  }

  test("Confs.withConf: restores a previously-set value, restores an " +
      "unset key by unsetting, and restores on exception") {
    val key = "spark.graft.test.scoped_conf"
    // unset key: must be unset again after the block
    graft.engine.Confs.withConf(spark, key, "inner") {
      assert(spark.conf.get(key) === "inner")
    }
    assert(spark.conf.getOption(key).isEmpty, "unset key restored by unset")
    // set key: must restore the prior value, even when the body throws
    spark.conf.set(key, "outer")
    intercept[RuntimeException] {
      graft.engine.Confs.withConf(spark, key, "inner") {
        assert(spark.conf.get(key) === "inner")
        throw new RuntimeException("boom")
      }
    }
    assert(spark.conf.get(key) === "outer", "restored after exception")
    spark.conf.unset(key)
  }

  test("ml_psi_features: the stacked long-form PSI equals a plain " +
      "single-feature computation with the same observed-bucket " +
      "smoothing") {
    // NOTE deliberate formulation difference vs dq_drift_psi: that
    // key smooths with a FIXED +10 denominator (its bin rule declares
    // 10 bins); the multi-feature screen smooths with the OBSERVED
    // bucket count per feature (priority has 5, status 3 — a fixed 10
    // would be wrong for them). So the pin replays the plain
    // per-feature form, driver-side, from the raw bucket counts.
    val cut = lit("1996-07-01").cast("timestamp")
    val counts = graft.Tables.orders(spark, sf)
      .select((col("o_orderdate") < cut).as("is_base"),
        expr("CAST(least(floor(o_totalprice / 60000.0), 9.0) AS STRING)")
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(when(col("is_base"), 1)).as("nb"),
        count(when(!col("is_base"), 1)).as("nc"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val k = counts.length
    val (tb, tc) = (counts.map(_._1).sum, counts.map(_._2).sum)
    val expected = counts.map { case (nb, nc) =>
      val p = (nb + 1).toDouble / (tb + k)
      val q = (nc + 1).toDouble / (tc + k)
      BigDecimal((p - q) * math.log(p / q))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    val multi = SparkEntry.queries("ml_psi_features")(spark, sf)
      .filter(col("feature") === "price_bin")
      .select("psi").collect()(0).getDouble(0)
    assert(math.abs(expected - multi) <= 1e-9,
      s"expected=$expected multi=$multi")
  }

  test("ml_kendall_tau plan: the pair join is a broadcast loop over " +
      "two AGGREGATE (domain-sized) sides — the corpus is scanned " +
      "once, never self-joined") {
    val p = SparkEntry.queries("ml_kendall_tau")(spark, sf)
      .queryExecution.sparkPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    // every scan of lineitem feeds an aggregate before any join:
    // the raw relation appears only below HashAggregate partials
    assert(!p.contains("SortMergeJoin"), p)
  }
}
