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
}
