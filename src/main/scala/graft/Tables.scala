package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Accessors for the driver-generated testdata tables plus shared
  * oracle-parity helpers (SURVEY.md §7.4 R3/R4).
  *
  * Money/metric columns in the testdata are doubles; to hash-match the
  * DuckDB oracle we sum them as exact decimals (deterministic regardless
  * of partitioning / add order) and round the few genuinely-floating
  * outputs (avg, stddev) to a fixed scale in BOTH engines.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp. Read it as raw nanos (legacy conf) and truncate
    * to a µs TimestampType — the same floor-division DuckDB's
    * `epoch_us()` applies, keeping both engines on identical µs values
    * (SURVEY §7.4 R2). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Exact decimal sum of a double expression: cast each value to
    * DECIMAL(18,scale) pre-agg (sum order then irrelevant), cast the sum
    * back to the same type so the Spark/DuckDB output schemas agree. */
  def dsum(c: Column, scale: Int): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DecimalType(18, scale))

  /** Double average rounded to a fixed scale — mirror with
    * ROUND(AVG(x), scale) in the oracle. */
  def ravg(c: Column, scale: Int): Column = round(avg(c), scale)
}
