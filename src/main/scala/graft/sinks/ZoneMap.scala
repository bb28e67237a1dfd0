package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-FILE min/max zone maps with a file-skipping reader (SURVEY §2
  * E14) — the storage-pruning layer BETWEEN directory partitioning
  * (E8: prunes by partition value) and row-group statistics (parquet
  * already prunes inside a file the scan opens): a range predicate on
  * a clustered column skips whole FILES without listing-time
  * partition structure, the zone-map idea (Moerkotte, "Small
  * Materialized Aggregates", VLDB'98) every lakehouse format ships
  * (Delta/Iceberg per-file stats).
  *
  * Why it matters at 100 TB: [[graft.operators.ZOrder]] clusters
  * multi-column locality into a 1-D sort, and THIS is the piece that
  * cashes that clustering in — after a z-ordered write, each file
  * covers a narrow hyper-rectangle, so most predicates eliminate most
  * files before any IO. Without a file-skipping reader the clustering
  * only improves compression.
  *
  * Manifest shape: one row per data file, (file, min_c, max_c per
  * stats column), written as parquet under `_zonemap/` (parquet
  * readers ignore underscore-prefixed dirs, same convention as
  * `_SUCCESS` and UpsertSink's `_CURRENT`). The manifest is
  * FILE-count-sized, not data-sized — the driver-side prune mirrors
  * how Delta/Iceberg readers replay per-file stats; at extreme file
  * counts the same manifest is itself a frame and the prune becomes a
  * join, but the contract (skip iff `[min, max] ∩ [lo, hi] = ∅` —
  * never a false skip) is unchanged.
  *
  * NULL semantics: min/max ignore NULLs, so a file of only-NULL cells
  * carries NULL bounds and is conservatively KEPT (a range predicate
  * drops its rows after the scan — correct, just unpruned). */
object ZoneMap {

  /** Write `df` as parquet under `path` plus a `_zonemap/` manifest
    * of per-file min/max for `statsCols`. Pair with a range
    * repartition + sort on the stats column(s) (or a z-order key)
    * before calling — zone maps only skip what the layout clusters. */
  def write(df: DataFrame, path: String, statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "ZoneMap.write: no stats columns")
    df.write.mode("overwrite").parquet(path)
    val written = df.sparkSession.read.parquet(path)
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    written
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zonemap")
  }

  /** The files whose `[min, max]` window on `statsCol` intersects
    * `[lo, hi]` (NULL bounds kept — see NULL semantics above). */
  def candidateFiles(spark: SparkSession, path: String, statsCol: String,
                     lo: Column, hi: Column): Seq[String] =
    spark.read.parquet(s"$path/_zonemap")
      .filter(col(s"max_$statsCol").isNull || col(s"min_$statsCol").isNull ||
        !(col(s"max_$statsCol") < lo || col(s"min_$statsCol") > hi))
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq

  /** Read rows with `statsCol ∈ [lo, hi]`, scanning ONLY files whose
    * zone intersects the range — result-identical to the full scan
    * plus filter (no false skips by construction; the residual filter
    * drops in-file non-matches). An empty candidate set returns an
    * empty frame with the table's schema. */
  def readRange(spark: SparkSession, path: String, statsCol: String,
                lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(spark, path, statsCol, lo, hi)
    val base =
      if (files.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(files: _*)
    base.filter(col(statsCol) >= lo && col(statsCol) <= hi)
  }
}
