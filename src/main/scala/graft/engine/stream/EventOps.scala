package graft.engine.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream transforms written once against the DataFrame API so the
  * same function runs in batch (DuckDB-oracle-checked, SURVEY §2.8) and
  * under Structured Streaming (`readStream` → transform → `writeStream`,
  * exercised with MemoryStream in ScalaTest).
  *
  * Streaming deployment notes (100 TB / unbounded):
  *  - callers add `withWatermark("ts", ...)` before the windowed aggs so
  *    state is evicted and late data dropped deterministically;
  *  - `dedupe` becomes `dropDuplicatesWithinWatermark` under a watermark;
  *  - state store is partitioned by the grouping key — same shuffle shape
  *    as the batch plan.
  */
object EventOps {

  /** 1h tumbling window: count + exact decimal sum of value per type. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))

  /** 1h windows sliding every 30 minutes. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"))

  /** Per-user session windows with a 30-minute inactivity gap. */
  def sessions(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_micros(col("session_window.start")).as("session_start_us"),
        col("user_id"), col("n_events"))

  /** Drop duplicate event ids (keeps an arbitrary — here unique — row). */
  def dedupe(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")
      .select("event_id", "user_id", "event_type")
}
