package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** The permanent unpartitioned-window census (round-8 ran this as a
  * one-off sweep; round-9 makes it a gate): walk EVERY declared key's
  * physical plan and require that each WindowExec with an empty
  * partition spec — the single-task global-sort funnel — sits above a
  * relation that is bounded by construction. Two bounds are accepted:
  *
  *  - STRUCTURAL: the window's child subtree contains a
  *    TakeOrderedAndProject / GlobalLimit / LocalLimit — a k-row
  *    relation whatever the input size; or a LocalTableScan /
  *    one-row Range (literal domain).
  *  - DECLARED: the key appears in `boundedByGrain` below with the
  *    stated bound — the window input is an aggregate (or generated
  *    spine) whose key domain is bounded by the operator's definition
  *    (calendar days, histogram bins, bands, cells, folds …), not by
  *    the data volume. Every entry names its bound so the allowlist
  *    is auditable, and the test still requires the child subtree to
  *    contain an aggregate/generator — a raw corpus-sized scan can
  *    never ride in on an allowlist entry.
  *
  * A future key that reintroduces the r7 anti-pattern (global rank
  * over a corpus-sized relation) fails this suite unless its author
  * states the bound here — which is exactly the review conversation
  * the census is meant to force. This suite is also the documented
  * rationale for the benign WindowExec single-partition WARNings the
  * verify run emits.
  */
class WindowCensusSpec extends AnyFunSuite with SparkFixture {

  /** key -> the stated bound of its global-window input. Every window
    * here runs over an AGGREGATE whose key domain the operator's
    * definition bounds — calendar grain, fixed bins/bands/deciles,
    * mixture cells, shard manifests — so the single task sees grain-
    * many rows however large the corpus is. */
  private val boundedByGrain: Map[String, String] = Map(
    "dq_drift_psi" -> "fixed PSI bin histogram",
    "dq_sequence_gaps" ->
      "blk2 block summary, <= keyspace/4096^2 rows (recursion level 3)",
    "event_interarrival_burstiness" ->
      "inter-arrival band histogram (fixed band count)",
    "graph_degree_gini" ->
      "distinct-degree histogram (O(sqrt E) distinct degrees)",
    "graph_modularity" -> "per-community aggregate (<= #communities)",
    "interval_concurrency" -> "per-day boundary deltas (calendar grain)",
    "maintain_zorder_effectiveness" -> "zval histogram (<= 2^20 bins)",
    "mix_epochs" -> "mixture cells (<= #langs x #sources)",
    "mix_round_lrm" -> "mixture cells (<= #langs x #sources)",
    "mix_temperature" -> "mixture cells (<= #langs x #sources)",
    "mix_token_budget" -> "mixture cells (<= #langs x #sources)",
    "ml_auc_roc" -> "distinct rounded scores (fixed score precision)",
    "ml_cost_threshold" ->
      "distinct rounded scores (fixed score precision)",
    "ml_ks_statistic" ->
      "distinct rounded scores (fixed score precision)",
    "ml_lift_table" -> "decile table (10 rows)",
    "ml_pr_auc" -> "distinct rounded scores (fixed score precision)",
    "pareto_gini_banded" -> "spend-band histogram (fixed band count)",
    "pareto_lorenz_deciles" ->
      "distinct spend cent-values histogram (value-domain-bounded)",
    "profile_ks_test" -> "fixed KS bin histogram",
    "profile_mutual_info" ->
      "contingency cells (enumerable category pair domain)",
    "sample_bootstrap_ci" -> "bootstrap replicate aggregate (<= R reps)",
    "sample_neyman" -> "per-stratum aggregate (<= #strata)",
    "shuffle_shards" -> "K-row shard manifest (<= #shards)",
    "sink_sorted_stats" -> "per-file stats (<= #files written)",
    "stream_late_drop" ->
      "per-micro-batch watermark summary (<= #batches)",
    "ab_mann_whitney" ->
      "distinct metric cent-values histogram (value-domain-bounded)",
    "time_autocorr" -> "calendar-grain series (days/months)",
    "time_ljung_box" -> "calendar-grain series (days/months)",
    "time_backtest_horizons" -> "calendar-grain series (days/months)",
    "time_changepoint" -> "calendar-grain series (days/months)",
    "time_control_chart" -> "calendar-grain series (days/months)",
    "time_cusum" -> "calendar-grain series (days/months)",
    "time_decompose_additive" -> "calendar-grain series (days/months)",
    "time_granger_f" -> "calendar-grain series (days/months)",
    "time_hurst_rs" -> "calendar-grain series (days/months)",
    "time_kpss" -> "calendar-grain series (days/months)",
    "time_runs_test" -> "calendar-grain series (days/months)",
    "time_max_drawdown" -> "calendar-grain series (days/months)",
    "time_mean_crossings" -> "calendar-grain series (days/months)",
    "time_pacf" -> "calendar-grain series (days/months)",
    "time_period_over_period" -> "calendar-grain series (days/months)",
    "time_rolling_corr" -> "calendar-grain series (days/months)",
    "time_sax_runs" -> "calendar-grain series (days/months)",
    "time_survival_km" ->
      "distinct event times at day grain (calendar-bounded)",
    "time_theilsen_trend" -> "calendar-grain series (days/months)",
    "time_velocity_accel" -> "calendar-grain series (days/months)",
    "vocab_build" ->
      ("frequency-floored vocabulary (<= total_tokens/minCount; " +
        "lexicon- not corpus-sized; id assignment needs a total order)"))

  /** Keys DELIBERATELY kept as exact one-task forms whose declared
    * scale path is a sibling key (r7 'done' criterion: the exact form
    * stays as the oracle-checked twin). */
  private val exactTwinException: Map[String, String] = Map(
    "profile_equidepth" ->
      "exact-NTILE twin; scale path is profile_equidepth_approx")

  private def subtreeBounded(p: SparkPlan): Boolean = {
    val s = p.toString
    s.contains("TakeOrderedAndProject") || s.contains("GlobalLimit") ||
      s.contains("LocalLimit") || s.contains("LocalTableScan") ||
      s.contains("WindowGroupLimit")
  }

  private def subtreeAggregated(p: SparkPlan): Boolean = {
    val s = p.toString
    s.contains("HashAggregate") || s.contains("SortAggregate") ||
      s.contains("ObjectHashAggregate") || s.contains("Generate") ||
      s.contains("Range (")
  }

  test("every unpartitioned WindowExec in all declared plans sits " +
      "above a limit or a declared grain-bounded relation") {
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, q) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val plan =
        try Some(q(spark, sf).queryExecution.sparkPlan)
        catch { case e: Throwable =>
          violations += s"$name: plan construction failed: ${e.getMessage}"
          None
        }
      plan.foreach { p =>
        val globals = p.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        globals.foreach { w =>
          val ok = subtreeBounded(w.child) ||
            (boundedByGrain.contains(name) && subtreeAggregated(w.child)) ||
            exactTwinException.contains(name)
          if (!ok) violations +=
            s"$name: unpartitioned WindowExec over unbounded child:\n" +
              w.child.toString.linesIterator.take(6).mkString("\n")
        }
      }
    }
    assert(violations.isEmpty,
      s"${violations.size} census violations:\n" +
        violations.mkString("\n---\n"))
  }
}
