package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-provided TPC-H-ish test data.
  *
  * Column pruning and predicate pushdown are left entirely to Catalyst:
  * every reader here returns the raw scan and the operators downstream
  * select only what they need, so `.explain` shows a minimal
  * `ReadSchema` + `PushedFilters` at the source.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = t(s, dir, "region")
  /** Engine-wide contract: `events.ts` is epoch-NANOSECONDS as a LONG.
    * The driver's generated parquet has shipped `ts` under different
    * logical types across rounds — TIMESTAMP(NANOS) (which Spark 4 only
    * reads via the `nanosAsLong` legacy conf, as a long) and plain
    * `timestamp[us]` (read as TIMESTAMP_NTZ). The engine's job is to
    * read whatever valid encoding arrives (the reference pins its own
    * row types at the single load path — `src/dumpr/query.clj:10-17`),
    * so this reader is the one choke point that restores the nanos-long
    * contract for every downstream `ts div 1000` micros conversion.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(t(s, dir, "events"))
  }

  /** Normalize a `ts` column to epoch-nanos LONG, whatever it arrived as.
    *
    *  - long: already the contract (TIMESTAMP(NANOS) under nanosAsLong).
    *  - TIMESTAMP_NTZ: wall-clock micros via `timestampdiff` against the
    *    NTZ epoch — timezone-INDEPENDENT (no session-tz cast), exactly
    *    DuckDB's `epoch_us(CAST(ts AS TIMESTAMP))` on the same file.
    *  - TIMESTAMP (instant): `unix_micros`, also tz-independent.
    *
    * Micros × 1000 cannot overflow (year-2262 bound, same as any nanos
    * timestamp). Frames without `ts` pass through untouched.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    if (!df.columns.contains("ts")) df
    else df.schema("ts").dataType match {
      case LongType => df
      case TimestampNTZType => df.withColumn("ts",
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * lit(1000L))
      case TimestampType => df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported type $other (expected nanos-long or timestamp)")
    }
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
