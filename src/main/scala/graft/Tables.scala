package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects
    * outright; read it as a long (nanoseconds since epoch) via the
    * legacy conf — set at runtime so any caller-provided session works.
    * All downstream operators treat `ts` as epoch-nanos and convert to
    * micros (`ts div 1000`), matching DuckDB's ns→µs cast truncation.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
  }
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
