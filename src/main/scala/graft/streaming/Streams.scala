package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Structured-Streaming transformations for the events table. Each is a
  * plain DataFrame→DataFrame function usable under BOTH `spark.read`
  * (batch) and `spark.readStream` — Spark's batch/stream unification: the
  * watermark node is analyzed away in batch mode, so StreamQueries reuses
  * these exact plans and the streaming spec asserts batch/stream result
  * equivalence on the same input.
  *
  * The reference has no streaming (HTTP-triggered batch,
  * commerical_rfp_data_ingestion_main.py:13); this is the north-star
  * capability. At scale the watermark bounds state: window state is
  * dropped once `max(event time) - delay` passes the window end, so
  * long-running jobs hold O(windows-in-flight × groups), not O(history).
  */
object Streams {
  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Tumbling 1-hour windows per event_type with a 2-hour watermark —
    * the q_events_hourly plan. */
  def hourlyCounts(events: DataFrame): DataFrame = events
    .withWatermark("ts", "2 hours")
    .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
    .agg(count(lit(1)).as("n"),
      sum(dec(col("value"))).cast("double").as("sum_value"))
    .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
      col("event_type"), col("n"), col("sum_value"))
}
