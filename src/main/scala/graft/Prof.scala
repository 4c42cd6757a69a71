package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profiler for one declared query — the measure-don't-guess
  * loop behind every perf change: `runMain graft.Prof <sfDir> <query>`
  * warms up at sf0.001, runs the query once at `sfDir`, and prints the
  * job count plus the slowest stages (duration, task count, name). Use
  * it before and after a rewrite; trust medians from Bench for totals.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qname = if (args.length > 1) args(1) else "dedup_ngram"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir", "/tmp/graft_prof_wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Int)]
    var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = si.completionTime.getOrElse(0L) -
          si.submissionTime.getOrElse(0L)
        stages +=
          ((si.stageId, si.name.split("\n").head.take(90), dur, si.numTasks))
      }
    })
    val fn = SparkEntry.queries(qname)
    fn(spark, "/root/testdata/sf0.001").count() // JIT + codegen warmup
    graft.engine.ml.Dedup.unpersistTracked()
    stages.clear(); jobs = 0
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    graft.engine.ml.Dedup.unpersistTracked()
    println(f"== $qname rows=$n total=$total%.3f s jobs=$jobs " +
      f"stages=${stages.length} stageSum=${stages.map(_._3).sum} ms")
    stages.sortBy(-_._3).take(20).foreach { case (id, nm, dur, nt) =>
      println(f"  stage $id%4d $dur%6d ms tasks=$nt%3d  $nm")
    }
    spark.stop()
  }
}
