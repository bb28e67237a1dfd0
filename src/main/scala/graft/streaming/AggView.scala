package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

import graft.streaming.ChangelogStream.{Change, Entity}

/** Incrementally-maintained grouped aggregate over a changelog stream
  * — the reference's "building live views of data for analytics"
  * use case (reference `README.md`) taken past entity state to the
  * AGGREGATE the analyst actually reads (sum/count per group, e.g.
  * revenue per table/domain/region), kept current under upserts,
  * value updates and deletes without ever rescanning the table.
  *
  * Native streaming aggregation cannot express this: an upsert stream
  * is not an append stream — a new value for key k must RETRACT the
  * old value's contribution, and deletes must subtract. The classic
  * incremental-view-maintenance identity (sum and count are
  * self-maintainable under point updates) does it with per-key state:
  *
  *  1. [[aggDeltas]]: the entity fold ([[ChangelogStream.entityState]]
  *     semantics — later pos wins, same-pos delete-before-upsert)
  *     keyed by (tbl, id) compares each key's folded batch outcome to
  *     its prior state and emits one (grp, ΔSum, ΔCnt) fact per
  *     changed key: insert → (+v, +1), value update → (+v−v₀, 0),
  *     delete → (−v₀, −1), no-op → nothing. State: one Entity per key
  *     (exactly what entityState already pays); output: append-only
  *     delta facts, batch-sized.
  *  2. [[mergeBatch]]: deltas aggregate per group (map-side combined)
  *     and merge into the published view by full-outer join. The view
  *     table is GROUP-cardinality — tables/domains/regions, a
  *     dim-sized frame by construction — so rewriting it per batch is
  *     O(groups), not O(table): this is the right shape here, unlike
  *     [[UpsertSink]]'s key-cardinality snapshot, which is why that
  *     sink buckets and this one does not. Publish is the same
  *     versioned-dir + atomic `_CURRENT` pointer flip, idempotent per
  *     batchId (replay after a crash between flip and checkpoint
  *     commit is a no-op; a replay whose state already reflected the
  *     batch emits zero deltas, which the guard also absorbs).
  *
  * Money-grade sums should switch `value` to decimal end-to-end; the
  * double here follows the changelog fixture's schema.
  */
object AggView {

  /** One group's maintained aggregate. */
  case class GroupAgg(grp: String, sumVal: Double, cnt: Long)

  /** Per-key change in group contribution (append-only facts). */
  case class GroupDelta(grp: String, dSum: Double, dCnt: Long)

  /** Stage 1: changelog → per-key aggregate deltas. `grpOf` maps a
    * key (tbl, id) to its group — any pure function of the key (group
    * by table, id range, shard, …). */
  def aggDeltas(changes: Dataset[Change],
                grpOf: (String, Long) => String): Dataset[GroupDelta] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(c => (c.tbl, c.id))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (String, Long), rows: Iterator[Change], state: GroupState[Entity]) => {
          val prior = state.getOption
          // same fold as entityState: later pos wins; at equal pos the
          // upsert applies after the delete (PK-swap image order)
          val sorted = rows.toSeq.sortBy(c => (c.pos, c.op == "upsert"))
          var cur = prior.orNull
          sorted.foreach { c =>
            if (cur == null || c.pos >= cur.lastPos)
              cur = Entity(key._1, key._2, c.value, c.pos, live = c.op == "upsert")
          }
          if (cur != null) state.update(cur)
          val oldVal = prior.collect { case e if e.live => e.value }.getOrElse(0.0)
          val newLive = cur != null && cur.live
          val newVal = if (newLive) cur.value else 0.0
          val dSum = newVal - oldVal
          val dCnt = (if (newLive) 1L else 0L) - (if (prior.exists(_.live)) 1L else 0L)
          if (dSum == 0.0 && dCnt == 0L) Iterator.empty
          else Iterator.single(GroupDelta(grpOf(key._1, key._2), dSum, dCnt))
        })
  }

  private val current = "_CURRENT"

  private def currentVersion(dir: String): Option[String] = {
    val p = Paths.get(dir, current)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim) else None
  }

  /** The currently-published view (empty if never published). */
  def readCurrent(spark: SparkSession, dir: String): DataFrame =
    currentVersion(dir) match {
      case Some(v) => spark.read.parquet(s"$dir/$v")
      case None =>
        import spark.implicits._
        Seq.empty[GroupAgg].toDF()
    }

  /** Delete all but the newest `retain` version dirs (min 2: a reader
    * that resolved the pointer just before a flip may still be
    * scanning the previous version). */
  def pruneVersions(dir: String, retain: Int): Unit = {
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
      f.delete(); ()
    }
    val versions = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .sortBy(_.getName.drop(1).toLong)
    versions.dropRight(math.max(retain, 2)).foreach(deleteRec)
  }

  /** Stage 2: fold one batch of deltas into the published view.
    * Idempotent per batchId. Groups whose count returns to zero leave
    * the view (a fully-deleted group is absent, not a 0-row);
    * `retainVersions` bounds on-disk history — without it a
    * long-running view accumulates one version dir per micro-batch
    * forever. */
  def mergeBatch(deltas: Dataset[GroupDelta], dir: String, batchId: Long,
                 retainVersions: Int = 2): Unit = {
    if (currentVersion(dir).contains(s"v$batchId")) return
    val spark = deltas.sparkSession
    val agg = deltas.groupBy(col("grp"))
      .agg(sum(col("dSum")).as("dSum"), sum(col("dCnt")).as("dCnt"))
    val merged = readCurrent(spark, dir).as("c")
      .join(agg.as("d"), Seq("grp"), "full_outer")
      .select(col("grp"),
        (coalesce(col("sumVal"), lit(0.0)) + coalesce(col("dSum"), lit(0.0))).as("sumVal"),
        (coalesce(col("cnt"), lit(0L)) + coalesce(col("dCnt"), lit(0L))).as("cnt"))
      .where(col("cnt") > 0)
    val version = s"v$batchId"
    // the view is dim-sized: one output file keeps readers trivial
    merged.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/$version")
    val tmp = Paths.get(dir, s".$current.tmp")
    Files.write(tmp, version.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(dir, current),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    pruneVersions(dir, retainVersions)
  }

  /** Maintain a live (grp, sumVal, cnt) view of `changes` at `dir`. */
  def materialize(changes: Dataset[Change], grpOf: (String, Long) => String,
                  dir: String, checkpointDir: String): StreamingQuery =
    aggDeltas(changes, grpOf).writeStream
      .foreachBatch((batch: Dataset[GroupDelta], batchId: Long) =>
        mergeBatch(batch, dir, batchId))
      .option("checkpointLocation", checkpointDir)
      .start()
}
