package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-partitioned changelog materialization (SURVEY §2 E8) — the
  * batch counterpart of [[graft.streaming.UpsertSink]]: land the op
  * stream as `day=YYYY-MM-DD/` parquet partitions so downstream scans
  * prune by day (at 100 TB the partition column IS the primary access
  * path) and daily backfills are idempotent.
  *
  * Overwrite is DYNAMIC: a re-run replaces exactly the day partitions
  * present in the incoming batch and leaves every other day untouched
  * — static overwrite mode would wipe the whole root on every
  * backfill, the classic data-loss footgun this wrapper exists to
  * remove. */
object PartitionedSink {

  /** Write `df` under `path`, partitioned by the UTC day of `usCol`
    * (epoch-microseconds). */
  def writeByDay(df: DataFrame, path: String, usCol: String = "us"): Unit =
    df.withColumn("day", date_format(timestamp_micros(col(usCol)), "yyyy-MM-dd"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("day")
      .parquet(path)

  /** Read back with the partition predicate attached — `.explain`
    * shows it under `PartitionFilters`, i.e. non-matching days are
    * never listed, let alone scanned. */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).where(col("day") === day)
}
