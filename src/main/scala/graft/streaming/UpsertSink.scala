package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.ChangelogStream.Change

/** Keyed-table materialization sink: maintains an always-current
  * parquet table from a changelog stream — the end-to-end form of the
  * reference's headline use cases ("populating a search index live",
  * "building live views of data for caching or analytics", reference
  * `README.md`).
  *
  * Per micro-batch (`foreachBatch`):
  *  1. fold the batch to its last op per (tbl, id) — one shuffle on
  *     the batch only;
  *  2. full-outer merge with the current snapshot (batch wins,
  *     deletes drop rows) — the incremental form of
  *     [[graft.cdc.Changelog.applyChangelog]];
  *  3. publish a new snapshot version directory and flip the
  *     `_CURRENT` pointer file.
  *
  * Versioned directories + a pointer file give atomic publish on any
  * filesystem with atomic small-file writes (on object stores you'd
  * swap the pointer for a manifest commit, e.g. a table format's
  * transaction log — the merge plan itself is unchanged).
  *
  * Restart idempotence: the published batch id is recoverable from the
  * pointer itself (`v<batchId>`). A crash after the pointer flip but
  * before the streaming checkpoint commits makes the engine replay the
  * batch — without the [[alreadyPublished]] guard that replay would
  * read snapshot `v<batchId>` as input and `Overwrite` the very same
  * directory, which Spark rejects, turning a clean recovery into a
  * crash-loop. With the guard, a replayed batch that already published
  * is a no-op (the batch contents are identical on replay — the
  * checkpoint pins the offsets — so the published snapshot is exactly
  * the merge result).
  */
object UpsertSink {

  private val current = "_CURRENT"

  /** True iff `v<batchId>` is already the published snapshot. */
  private def alreadyPublished(tableDir: String, batchId: Long): Boolean = {
    val ptr = Paths.get(tableDir, current)
    Files.exists(ptr) &&
      new String(Files.readAllBytes(ptr), "UTF-8").trim == s"v$batchId"
  }

  /** Read the currently-published snapshot (empty frame if none). */
  def readCurrent(spark: SparkSession, tableDir: String): DataFrame = {
    val ptr = Paths.get(tableDir, current)
    if (Files.exists(ptr)) {
      val v = new String(Files.readAllBytes(ptr), "UTF-8").trim
      spark.read.parquet(s"$tableDir/$v")
    } else {
      import spark.implicits._
      Seq.empty[(String, Long, Double, Long)].toDF("tbl", "id", "value", "lastPos")
    }
  }

  /** Delete all but the newest `retain` published version dirs. The
    * current and previous versions are always kept (readers that
    * resolved the pointer just before a flip may still be scanning the
    * previous snapshot); older ones are eligible. On an object store
    * you'd defer this to a table format's vacuum with a reader lease —
    * same policy, different mechanism. */
  def pruneVersions(tableDir: String, retain: Int): Unit = {
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
      f.delete(); ()
    }
    val versions = Option(new java.io.File(tableDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .sortBy(_.getName.drop(1).toLong)
    versions.dropRight(math.max(retain, 2)).foreach(deleteRec)
  }

  /** Merge one batch of changes into the snapshot and publish.
    * Idempotent per batchId: a replay of an already-published batch
    * (crash between pointer flip and checkpoint commit) is a no-op.
    * `retainVersions` bounds on-disk history (min 2: current +
    * previous). */
  def mergeBatch(batch: Dataset[Change], tableDir: String, batchId: Long,
                 retainVersions: Int = 2): Unit = {
    if (alreadyPublished(tableDir, batchId)) return
    val spark = batch.sparkSession
    val w = Window.partitionBy(col("tbl"), col("id")).orderBy(col("pos").desc)
    val folded = batch.toDF()
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("tbl"), col("id"), col("value"), col("op"), col("pos"))
    val cur = readCurrent(spark, tableDir)
    val merged = cur.as("c")
      .join(folded.as("b"), col("c.tbl") === col("b.tbl") && col("c.id") === col("b.id"),
        "full_outer")
      .filter(coalesce(col("b.op"), lit("upsert")) === "upsert")
      .select(
        coalesce(col("b.tbl"), col("c.tbl")).as("tbl"),
        coalesce(col("b.id"), col("c.id")).as("id"),
        when(col("b.id").isNotNull, col("b.value")).otherwise(col("c.value")).as("value"),
        when(col("b.id").isNotNull, col("b.pos")).otherwise(col("c.lastPos")).as("lastPos"))
    val version = s"v$batchId"
    merged.write.mode(SaveMode.Overwrite).parquet(s"$tableDir/$version")
    val tmp = Paths.get(tableDir, s".$current.tmp")
    Files.write(tmp, version.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(tableDir, current),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    pruneVersions(tableDir, retainVersions)
  }

  /** Start materializing a changelog stream into `tableDir`. */
  def materialize(changes: Dataset[Change], tableDir: String,
                  checkpointDir: String): StreamingQuery =
    changes.writeStream
      .foreachBatch((batch: Dataset[Change], batchId: Long) =>
        mergeBatch(batch, tableDir, batchId))
      .option("checkpointLocation", checkpointDir)
      .start()
}
