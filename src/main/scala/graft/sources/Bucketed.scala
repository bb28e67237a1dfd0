package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table write/read helpers (SURVEY §2 E6) — the co-located
  * join path.
  *
  * Two tables bucketed on the same key into the same bucket count
  * satisfy a sort-merge join's distribution requirement straight off
  * the scan: NO Exchange on either side, at any data size. This is
  * the "pre-partition your fact tables once, join them forever for
  * free" pattern that a 100 TB star schema lives on — the shuffle is
  * paid once at write time (and that write was usually happening
  * anyway) instead of on every query.
  *
  * Spark ties bucketing metadata to the catalog, so bucketed data is
  * written with `saveAsTable` + an explicit external `path`. The
  * in-memory catalog is enough for tests; production uses the
  * cluster metastore.
  */
object Bucketed {

  /** Write `df` as an external parquet table bucketed (and
    * sorted-within-buckets) by `key`. */
  def write(df: DataFrame, table: String, key: String, buckets: Int, path: String): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
