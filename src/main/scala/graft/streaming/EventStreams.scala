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

  /** Streaming exact dedup on document content (SURVEY §2 B10): the
    * ingest-time twin of [[graft.operators.Dedup.exact]]. State is
    * keyed by the 8-byte content fingerprint, NOT the text —
    * `dropDuplicates` state stores the dedup columns, so keying on the
    * fingerprint keeps the state store at ~16 bytes/doc instead of
    * whole bodies (the same body-never-shuffles rule the batch dedup
    * follows). The event-time watermark bounds state: a duplicate
    * arriving later than `watermark` after the original may pass —
    * that's the documented at-scale trade (unbounded streaming dedup
    * state is a 100 TB non-starter); the batch MinHash/exact pass
    * downstream catches stragglers. */
  def dedupDocs(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", graft.functions.Hashing.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming gap-based sessionization (SURVEY §2 B11) — the live
    * twin of the batch `sessionize` query (C5), via Spark's native
    * `session_window` (merging event-time windows with a gap timeout):
    * no hand-rolled state, watermark-bounded, append-mode — a session
    * row emits exactly once, when the watermark passes its close. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("start"),
        col("session_window.end").as("end"), col("n_events"))

  /** Watermarked stream-stream interval join (SURVEY §2 B12): each
    * purchase pairs with the same user's views from the preceding
    * hour. Both sides carry watermarks and the join condition bounds
    * event time in BOTH directions — that's what lets Spark expire
    * join state instead of buffering either stream forever (the
    * unbounded-state trap of naive stream joins). */
  def purchaseViewJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    val p = purchases.select(col("user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_val"))
      .withWatermark("purchase_ts", "10 minutes")
    p.join(v,
      p("user_id") === v("user_id") &&
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .drop(v("user_id"))
  }

  /** Streaming dead-letter routing (SURVEY §2 B17): the live twin of
    * the batch `cdc_dlq` query — the reference's `:error` row type on
    * the streaming path (`src/dumpr/stream.clj:196-210` emits error
    * rows inline when schema load/validation fails, so one poison row
    * never kills the stream).
    *
    * Each micro-batch is split ONCE: rows failing validation land in
    * the DLQ sink carrying their reason; everything else normalizes
    * onward. Both sinks are replay-idempotent without any table
    * format: a batch OVERWRITES its own deterministic `batch=<id>`
    * subdirectory, so a foreachBatch replay after a crash rewrites
    * identical files instead of appending duplicates (same convention
    * as [[UpsertSink]]'s version directories). The split is two
    * filters over one persisted batch — the batch is scanned once
    * from the source, not twice. */
  def routeWithDlq(events: DataFrame, goodDir: String, dlqDir: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val b = batch.persist()
      try {
        val bad = graft.cdc.RowFormat.deadLetter(b)
        val good = graft.cdc.RowFormat.normalize(b)
          .join(bad.select(col("pos")), Seq("pos"), "left_anti")
        bad.write.mode("overwrite").parquet(s"$dlqDir/batch=$batchId")
        good.write.mode("overwrite").parquet(s"$goodDir/batch=$batchId")
      } finally b.unpersist(blocking = false)
      ()
    }
}
