package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** File-based changelog stream source (SURVEY §2 A19).
  *
  * The reference tails a live MySQL binlog; in environments where the
  * engine consumes binlog DUMPS instead (CDC landing zones: Debezium /
  * canal / mysqlbinlog output parked on object storage), the
  * Spark-native seat is a file stream: `readStream` over a directory,
  * new files picked up per micro-batch, exactly-once via the stream's
  * checkpointed file log. The emitted frame carries the same
  * `(pos, op, tbl, id, …)` changelog schema the whole
  * [[graft.cdc.Changelog]] / [[graft.streaming.ChangelogStream]]
  * surface consumes, so every downstream operator works unchanged.
  *
  * Schema is enforced, not inferred — streaming sources must not
  * re-infer per batch (a short file could silently narrow a type). */
object ChangelogFiles {

  /** The canonical changelog schema (SURVEY §3). */
  val schema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("tbl", StringType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("tx", LongType, nullable = false),
    StructField("val", DoubleType, nullable = true),
    StructField("us", LongType, nullable = true),
    StructField("etype", StringType, nullable = true)))

  /** Tail `dir` for new parquet changelog files.
    * `maxFilesPerTrigger` bounds per-batch work (backpressure). */
  def stream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 64): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
}
