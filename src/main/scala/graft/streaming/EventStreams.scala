package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked event-stream aggregations (SURVEY §2 B3) — the
  * "populating live views / analytics without re-querying MySQL" use
  * case from the reference README, done the Structured-Streaming way.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with a watermark.
    * `events` needs (ts: timestamp, event_type, value). Append mode:
    * windows close once the watermark passes, giving exactly-once
    * window results to the sink. */
  def windowedCounts(events: DataFrame, windowDur: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_val"))
}
