package graft

import org.scalatest.funsuite.AnyFunSuite

/** Spark 3.5+ plans a rank-filter over a partitioned window as a
  * WindowGroupLimit: per-partition bounded group-limits run BEFORE the
  * shuffle, so a top-k-per-group never sorts whole groups — the
  * scale property win_topk_per_group and win_rank's consumers rely
  * on. Pin it so a future rewrite can't silently lose it. */
class WindowGroupLimitSpec extends AnyFunSuite with SparkFixture {

  test("win_topk_per_group plans a WindowGroupLimit below the window") {
    val p = SparkEntry.queries("win_topk_per_group")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
    // partial (pre-shuffle) AND final group-limit — map-side pruning
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
  }
}
