package graft.tools
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, args(1))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("HashAggregate") ||
      l.contains("Join") || l.contains("Window"))
      .map(_.replaceAll("#\\d+L?","")).mkString("\n"))
    spark.stop()
  }
}
