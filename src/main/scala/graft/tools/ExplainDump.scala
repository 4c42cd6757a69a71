package graft.tools
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to plans/<tag>/<q>_<suffix>.txt —
  * the before/after plan evidence for optimization rounds.
  *   runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> q1 q2 ...
  * Uses the bench session shape (local[32], shuffle.partitions=32) so the
  * dumped plan is the one the bench actually runs.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val keys = args.drop(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_explain_wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { k =>
      val df = graft.SparkEntry.queries(k)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${k}_$suffix.txt"), formatted)
      graft.engine.ml.Dedup.unpersistTracked()
      println(s"wrote $outDir/${k}_$suffix.txt")
    }
    spark.stop()
  }
}
