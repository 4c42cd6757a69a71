package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Micro-profiler for declared queries: runs each named query `reps`
  * times against a sfDir and prints median wall seconds plus the Spark
  * job / stage / shuffle-write counts of the LAST rep — the fixed
  * per-query overhead (#stages × scheduling cost) is what dominates at
  * small SF, so this is the number to drive fusion work with.
  *
  * Usage: runMain graft.tools.Prof <sfDir> <reps> <query> [query ...]
  */
object Prof {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Prof <sfDir> <reps> <query> [...]")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var shuffleWriteBytes = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        shuffleWriteBytes += s.stageInfo.taskMetrics.shuffleWriteMetrics
          .bytesWritten
      }
    })

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to reps).map { i =>
        jobs = 0; stages = 0; shuffleWriteBytes = 0L
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        graft.engine.ml.Dedup.unpersistTracked()
        val dt = (System.nanoTime() - t0) / 1e9
        if (i == reps) println(
          f"$name%-24s rep$i $dt%6.2fs rows=$n jobs=$jobs " +
            f"stages=$stages shuffleMB=${shuffleWriteBytes / 1e6}%.1f")
        dt
      }
      val med = times.sorted.apply(times.length / 2)
      println(f"$name%-24s MEDIAN $med%6.2fs over $reps reps")
    }
    spark.stop()
  }
}
