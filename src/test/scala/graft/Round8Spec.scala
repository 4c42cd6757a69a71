package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 invariants: the approximate equi-depth path tracks the
  * exact NTILE form tightly at test SFs (the declared relation only
  * audits a loose ±25% band — this pins the real drift much closer),
  * and the threshold cell compaction touches only what it must. */
class Round8Spec extends AnyFunSuite with SparkFixture {

  test("profile_equidepth_approx: bucket depths track the exact " +
      "ntile depths within 5% at test SF") {
    val exact = SparkEntry.queries("profile_equidepth")(spark, sf)
      .select("bucket", "n").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // rebuild the approx depths (the declared relation exposes only
    // the audit booleans, deliberately — depths are approximate)
    val t = graft.Tables.orders(spark, sf).select(
      col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("v"))
    val fit = t.agg(
      expr("""approx_percentile(v,
                array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D),
                10000)""").as("bs"))
    val approx = t.crossJoin(broadcast(fit))
      .select(expr(
        "1 + aggregate(bs, 0, (acc, b) -> acc + if(v > b, 1, 0))")
        .cast("int").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = exact.values.sum
    assert(approx.values.sum === total, "coverage: every row bucketed")
    val expected = total / 10.0
    (1 to 10).foreach { b =>
      val drift = math.abs(approx.getOrElse(b, 0L) - expected) / expected
      assert(drift <= 0.05,
        s"bucket $b depth ${approx.getOrElse(b, 0L)} drifts " +
          f"${drift * 100}%.1f%% from $expected (exact ${exact(b)})")
    }
  }

  test("dq_sequence_gaps: the three-level blocked form equals the " +
      "textbook single-window form") {
    import org.apache.spark.sql.expressions.Window
    val blocked = SparkEntry.queries("dq_sequence_gaps")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val keys = graft.Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("k"))
    val textbook = keys
      .withColumn("prev", lag(col("k"), 1).over(Window.orderBy("k")))
      .filter(col("prev").isNotNull && col("k") - col("prev") > 1)
      .select((col("prev") + 1).as("s"), (col("k") - 1).as("e"),
        (col("k") - col("prev") - 1).as("l"))
      .orderBy(desc("l"), col("s")).limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(blocked === textbook)
  }

  test("blockedSequenceGaps: all three legs fire on a keyspace that " +
      "spans multiple blk2 blocks, and the union equals the textbook " +
      "gap set") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // blockSize = 4 → blk spans 4 keys, blk2 spans 16. Keys chosen so
    // gaps exist (a) inside one block, (b) across blocks within one
    // blk2, (c) across blk2 boundaries — the sf-data pin above never
    // reaches leg (c) because the test keyspace is far below 4096².
    val keys = Seq(0L, 2L, 3L,          // blk 0: within-block gap [1,1]
      5L, 6L,                            // blk 1: cross-blk gap [4,4]
      14L,                               // blk 3: cross-blk gap [7,13]
      35L,                               // blk2 2: cross-blk2 gap [15,34]
      64L, 67L,                          // blk2 4: [36,63] + within [65,66]
      200L)                              // blk2 12: cross-blk2 [68,199]
      .toDF("k")
    val got = graft.engine.ops.Scale.blockedSequenceGaps(keys, 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val textbook = keys
      .withColumn("prev", lag(col("k"), 1).over(Window.orderBy("k")))
      .filter(col("prev").isNotNull && col("k") - col("prev") > 1)
      .select((col("prev") + 1).as("s"), (col("k") - 1).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === textbook)
    assert(got.contains((1L, 1L)), "within-block leg")
    assert(got.contains((7L, 13L)), "cross-block leg")
    assert(got.contains((68L, 199L)), "cross-blk2 leg")
    // and the decomposition really uses three bounded stages: no
    // window in the plan orders the raw keyspace globally
    val plan = graft.engine.ops.Scale.blockedSequenceGaps(keys, 4L)
      .queryExecution.sparkPlan
    val unpartitioned = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.size === 1,
      "exactly one unpartitioned window (the blk2-summary stitch)")
  }

  test("rfm medians: the histogram drill-down equals the plain " +
      "global-rank k-th smallest") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val o = graft.Tables.orders(spark, sf)
    val maxD = o.agg(max(col("o_orderdate").cast("date")).as("max_d"))
    val rfm = o.groupBy("o_custkey").agg(
        max(col("o_orderdate").cast("date")).as("last_d"),
        count(lit(1)).as("frequency"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("monetary"))
      .crossJoin(broadcast(maxD))
      .withColumn("recency",
        datediff(col("max_d"), col("last_d")).cast("long"))
      .cache()
    val n = rfm.count()
    val k = ((n + 1) / 2).toInt
    def plainMed(dim: String): Double = rfm
      .select(col(dim).cast("double").as("v"))
      .withColumn("rn", row_number().over(Window.orderBy("v")))
      .filter(col("rn") === k).collect()(0).getDouble(0)
    // the declared query's segment split must match the plain medians
    val seg = SparkEntry.queries("rfm_segmentation")(spark, sf)
    val (rm, fm, mm) =
      (plainMed("recency"), plainMed("frequency"), plainMed("monetary"))
    val expected = rfm.withColumn("segment", concat(
        when(col("recency") <= rm, lit("2")).otherwise(lit("1")),
        when(col("frequency") >= fm, lit("2")).otherwise(lit("1")),
        when(col("monetary") >= mm, lit("2")).otherwise(lit("1"))))
      .groupBy("segment").agg(count(lit(1)).as("n_customers"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = seg.select("segment", "n_customers").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    rfm.unpersist()
  }

  test("interval identity: covered + idle spans the first-to-last " +
      "window per user") {
    val cov = SparkEntry.queries("interval_coverage")(spark, sf)
      .select("user_id", "covered_s").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gaps = SparkEntry.queries("interval_gaps")(spark, sf)
      .select("user_id", "idle_s").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val span = graft.Tables.events(spark, sf)
      .select(col("user_id"),
        (unix_micros(col("ts")) / lit(1000000L)).cast("long").as("st"))
      .groupBy("user_id")
      .agg((max(col("st")) + 300L - min(col("st"))).as("span"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    span.foreach { case (u, sp) =>
      assert(cov(u) + gaps.getOrElse(u, 0L) === sp,
        s"user $u: covered ${cov(u)} + idle ${gaps.getOrElse(u, 0L)}" +
          s" != span $sp")
    }
  }

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString()

  test("agg_multi_distinct: one Expand over ONE lineitem scan, " +
      "not n scans") {
    val p = plan("agg_multi_distinct")
    assert(p.contains("Expand"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("graph_jaccard: top-100 is TakeOrdered, degree joins are " +
      "broadcast, no cartesian") {
    val p = plan("graph_jaccard")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("time_period_over_period: the unpartitioned window runs over " +
      "the month-grain aggregate, never the row stream") {
    val df = SparkEntry.queries("time_period_over_period")(spark, sf)
    val p = df.queryExecution.executedPlan.toString()
    // the Window's child chain must contain the month HashAggregate —
    // i.e. aggregation happens BELOW the window operator
    val winIdx = p.indexOf("Window")
    val aggBelow = p.indexOf("HashAggregate", winIdx)
    assert(winIdx >= 0 && aggBelow > winIdx,
      "expected HashAggregate below (after, in tree print) Window:\n" + p)
  }

  test("join_exists_flags: three left joins, zero cartesian products") {
    val p = plan("join_exists_flags")
    assert(!p.contains("CartesianProduct"), p)
    assert("Join".r.findAllIn(p).size >= 3, p)
  }

  test("sample_importance is map-side only: no exchange in the plan") {
    val p = plan("sample_importance")
    assert(!p.contains("Exchange") ||
      // the final orderBy is presentation; allow only rangepartitioning
      !p.replaceAll("(?s)Exchange rangepartitioning.*?\\n", "")
        .contains("Exchange"), p)
  }

  test("time_survival_km: the unpartitioned KM window runs over the " +
      "day-grain aggregate, not the event stream") {
    val p = plan("time_survival_km")
    val winIdx = p.indexOf("Window")
    val aggBelow = p.indexOf("HashAggregate", winIdx)
    assert(winIdx >= 0 && aggBelow > winIdx, p)
  }

  test("spatial and dedup matrix joins plan no cartesian product") {
    assert(!plan("join_spatial_knn").contains("CartesianProduct"))
    assert(!plan("dedup_source_matrix").contains("CartesianProduct"))
  }

  test("graph_random_walks reads the persisted co-order projection, " +
      "not a per-query pair emission") {
    val p = plan("graph_random_walks")
    assert(p.contains("graft_graph_edges"), p)
  }

  test("time_hurst_rs / time_holt_linear: every unpartitioned stage " +
      "runs over the day-grain aggregate, never the order stream") {
    // hurst: the day-index Window's child chain contains the daily
    // HashAggregate (aggregation below the window in tree print)
    val p = plan("time_hurst_rs")
    val winIdx = p.indexOf("Window")
    val aggBelow = p.indexOf("HashAggregate", winIdx)
    assert(winIdx >= 0 && aggBelow > winIdx, p)
    // holt: one orders scan feeding the fold — no window at all, the
    // sequential recursion lives in a single HOF aggregate
    val ph = plan("time_holt_linear")
    assert(!ph.contains("Window "), ph)
    assert("Scan parquet".r.findAllIn(ph).size == 1, ph)
  }

  test("winnowing / reciprocity / markov windows are key-partitioned " +
      "(doc_id / user_id), never global") {
    Seq("text_winnow_fingerprint" -> "doc_id",
        "graph_reciprocity" -> "user_id",
        "event_markov_stationary" -> "user_id").foreach {
      case (k, part) =>
        val p = plan(k)
        // every Window operator line must carry the partition key
        p.linesIterator.filter(_.contains("Window [")).foreach { l =>
          assert(l.contains(part), s"$k has a Window not partitioned " +
            s"by $part:\n$l")
        }
        assert(!p.contains("CartesianProduct"), p)
    }
  }

  test("text_burstiness: top-20 is TakeOrdered + broadcast semi " +
      "join, no global sort before the limit") {
    val p = plan("text_burstiness")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sim_search_radius / time_cross_corr plan no cartesian " +
      "product (broadcast probe / date-shift equi join)") {
    assert(!plan("sim_search_radius").contains("CartesianProduct"))
    assert(!plan("time_cross_corr").contains("CartesianProduct"))
  }

  test("fourth-session top-k keys plan TakeOrdered, not a global " +
      "sort (pagerank_personalized, bipartite_projection)") {
    Seq("graph_pagerank_personalized", "graph_bipartite_projection")
      .foreach { k =>
        val p = plan(k)
        assert(p.contains("TakeOrderedAndProject"), s"$k:\n$p")
        assert(!p.contains("CartesianProduct"), s"$k:\n$p")
      }
  }

  test("fourth-session bounded-domain windows run over an aggregate " +
      "(zorder histogram, token-budget bands, pacf day grain)") {
    Seq("maintain_zorder_effectiveness", "mix_token_budget",
        "time_pacf").foreach { k =>
      val p = plan(k)
      val winIdx = p.indexOf("Window")
      val aggBelow = p.indexOf("HashAggregate", winIdx)
      assert(winIdx >= 0 && aggBelow > winIdx,
        s"$k: expected HashAggregate below Window:\n$p")
    }
  }

  test("fourth-session event-stream windows are user-partitioned, " +
      "never global (dwell, concordance, markov entropy/convergence)") {
    Seq("event_dwell_time", "dq_order_concordance",
        "event_markov_entropy", "event_markov_convergence").foreach {
      k =>
        val p = plan(k)
        p.linesIterator.filter(_.contains("Window [")).foreach { l =>
          assert(l.contains("user_id"),
            s"$k has a Window not partitioned by user_id:\n$l")
        }
        assert(!p.contains("CartesianProduct"), s"$k:\n$p")
    }
  }

  test("join_null_isolated: the join branch filters nulls before " +
      "the exchange; the null branch plans no join at all") {
    val p = plan("join_null_isolated")
    assert(p.contains("Union"), p)
    // exactly one join in the whole plan — the null branch bypasses it
    assert("Join".r.findAllIn(p).size == 1, p)
    // the join's stream side carries the not-null screen — the
    // optimizer pushes it into the scan as a CASE data filter
    assert(p.contains("isnotnull(l_suppkey"), p)
  }

  test("time_mann_kendall: the pair join runs over day-grain " +
      "aggregates, never the order stream") {
    val p = plan("time_mann_kendall")
    // the day-grain series is checkpointed once — every consumer
    // (pair join sides, n, ties) reads the materialized relation, so
    // the orders parquet scan appears ZERO times in the final plan
    assert(!p.contains("Scan parquet"), p)
  }

  test("fifth-session row-level windows are key-partitioned " +
      "(qualify, distinct_on, frame_exclude, lift ranks)") {
    Seq("sql_qualify" -> "o_orderpriority",
        "sql_distinct_on" -> "o_custkey",
        "win_frame_exclude" -> "o_custkey",
        "ml_lift_table" -> "sc").foreach { case (k, key) =>
      val p = plan(k)
      val rowWins = p.linesIterator
        .filter(_.contains("Window ["))
        .filterNot(_.contains("windowspecdefinition(" + key))
        .toList
      // every remaining Window must partition on the declared key or
      // run over a bounded aggregate (the histogram/decile cums)
      rowWins.foreach { l =>
        assert(l.contains(key) || l.contains("decile") ||
          l.contains("sc#") || l.contains("cb"),
          s"$k has an unexpected unpartitioned row-level Window:\n$l")
      }
      assert(!p.contains("CartesianProduct"), s"$k:\n$p")
    }
  }

  test("fifth-session bounded-domain windows sit above aggregates " +
      "(auc histogram, rolling corr, decomposition, late-drop)") {
    Seq("ml_auc_roc", "time_rolling_corr", "time_decompose_additive",
        "stream_late_drop").foreach { k =>
      val p = plan(k)
      val winIdx = p.indexOf("Window")
      val aggBelow = p.indexOf("HashAggregate", math.max(winIdx, 0))
      assert(winIdx >= 0 && aggBelow > winIdx,
        s"$k: expected HashAggregate below Window:\n$p")
    }
  }

  test("fifth-session vector keys broadcast the anchor side and plan " +
      "no cartesian product") {
    Seq("vec_hard_negatives", "vec_precision_at_k", "vec_ndcg_at_k")
      .foreach { k =>
        val p = plan(k)
        assert(!p.contains("CartesianProduct"), s"$k:\n$p")
        assert(p.contains("BroadcastNestedLoopJoin") ||
          p.contains("BroadcastHashJoin"), s"$k:\n$p")
      }
  }

  test("etl_surrogate_key sample is a TakeOrdered, not a global sort") {
    val p = plan("etl_surrogate_key")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("scan_nested_pruning: the read-back scan's schema carries ONLY " +
      "the touched subfield, not the sibling struct members") {
    val p = plan("scan_nested_pruning")
    val schemaLine = p.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(schemaLine.contains("price"), p)
    assert(!schemaLine.contains("status") && !schemaLine.contains("odate"),
      "sibling subfields not pruned from the scan:\n" + schemaLine)
  }

  test("scan_nested_filter_pushdown: the nested-leaf predicate reaches " +
      "the parquet reader as a pushed filter") {
    val p = plan("scan_nested_filter_pushdown")
    val pushed = p.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    assert(pushed.contains("price"),
      "info.price predicate not pushed to the scan:\n" + p)
  }
}
