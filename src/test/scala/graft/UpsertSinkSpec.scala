package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.ChangelogStream.Change
import graft.streaming.UpsertSink

/** End-to-end live-view materialization: changelog stream → parquet
  * snapshot that always equals the serial fold of the history. */
class UpsertSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("materialize maintains the entity fold across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("graft_sink").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    val in = MemoryStream[Change]
    val q = UpsertSink.materialize(in.toDS(), tableDir, ckpt)

    in.addData(
      Change(1, "upsert", "t", 1, 1.0),
      Change(2, "upsert", "t", 2, 2.0),
      Change(3, "upsert", "t", 1, 1.5)) // same-batch update wins by pos
    q.processAllAvailable()
    val snap1 = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toSet
    assert(snap1 == Set((1L, 1.5), (2L, 2.0)))

    in.addData(
      Change(4, "delete", "t", 2, 0.0), // delete across batches
      Change(5, "upsert", "t", 3, 3.0)) // insert
    q.processAllAvailable()
    q.stop()
    val snap2 = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toSet
    assert(snap2 == Set((1L, 1.5), (3L, 3.0)))
  }

  test("replay of an already-published batch recovers instead of crash-looping") {
    val tableDir = Files.createTempDirectory("graft_sink_replay").toString
    val b0 = Seq(
      Change(1, "upsert", "t", 1, 1.0),
      Change(2, "upsert", "t", 2, 2.0)).toDS()
    UpsertSink.mergeBatch(b0, tableDir, 0L)
    // crash between pointer flip and checkpoint commit ⇒ the engine
    // re-invokes foreachBatch with the SAME batchId and contents.
    // Before the published-batch guard this read v0 and Overwrote v0 —
    // Spark rejects overwriting an input path, so recovery looped.
    UpsertSink.mergeBatch(b0, tableDir, 0L) // must be a clean no-op
    val snap0 = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toSet
    assert(snap0 == Set((1L, 1.0), (2L, 2.0)))
    // and the stream continues normally afterwards
    val b1 = Seq(
      Change(3, "delete", "t", 1, 0.0),
      Change(4, "upsert", "t", 3, 3.0)).toDS()
    UpsertSink.mergeBatch(b1, tableDir, 1L)
    val snap1 = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toSet
    assert(snap1 == Set((2L, 2.0), (3L, 3.0)))
  }

  test("rebucket migrates a grown table: same data, new bucket count, safe reads, merges at newN") {
    val tableDir = Files.createTempDirectory("graft_sink_rebucket").toString
    val keys = (1L to 120L)
    UpsertSink.mergeBatch(
      keys.map(k => Change(k, "upsert", "t", k, k * 1.0)).toDS(),
      tableDir, 0L, numBuckets = 4, retainVersions = 4)
    UpsertSink.mergeBatch(
      Seq(Change(200L, "upsert", "t", 5L, 55.0), Change(201L, "delete", "t", 6L, 0.0)).toDS(),
      tableDir, 1L, numBuckets = 4, retainVersions = 4)
    val before = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toSet
    // a reader plan resolved BEFORE the rebucket (old version's dirs)
    val inFlight = UpsertSink.readCurrent(spark, tableDir)

    UpsertSink.rebucket(spark, tableDir, 16, retainVersions = 4)

    assert(UpsertSink.storedNumBuckets(tableDir) == Some(16))
    val after = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toSet
    assert(after == before, "rebucket must not change the table contents")
    // every current bucket dir belongs to the rebucket version, at newN
    val cur = graft.streaming.ViewLayout.currentVersion(tableDir).get
    val manifest = graft.streaming.ViewLayout.readBucketManifest(tableDir, cur)
    assert(manifest.keys.forall(_ < 16) && manifest.values.forall(_.startsWith(s"$cur/")))
    assert(manifest.size > 4, s"120 keys across 16 buckets should occupy >4, got ${manifest.size}")
    // read-during-rebucket: the pre-rebucket plan still scans its (retained) dirs
    assert(inFlight.select("id", "value").as[(Long, Double)].collect().toSet == before)
    // the old count now fails fast instead of corrupting the merge
    intercept[IllegalArgumentException] {
      UpsertSink.mergeBatch(Seq(Change(300L, "upsert", "t", 1L, 9.0)).toDS(),
        tableDir, 2L, numBuckets = 4, retainVersions = 4)
    }
    // a post-rebucket merge at the new count folds correctly and stays
    // bucket-incremental (one key ⇒ one bucket dir in the new version)
    UpsertSink.mergeBatch(Seq(Change(300L, "upsert", "t", 1L, 9.0)).toDS(),
      tableDir, 2L, numBuckets = 16, retainVersions = 4)
    val v3 = graft.streaming.ViewLayout.currentVersion(tableDir).get
    val newDirs = Option(new java.io.File(s"$tableDir/$v3").listFiles()).get
      .filter(f => f.isDirectory && f.getName.startsWith("__bucket=")).map(_.getName).toSet
    assert(newDirs.size == 1, s"one-key batch after rebucket must rewrite one bucket: $newDirs")
    val folded = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toMap
    assert(folded(1L) == 9.0 && folded(5L) == 55.0 && !folded.contains(6L))
    // replay of the post-rebucket batch id is still a no-op
    UpsertSink.mergeBatch(Seq(Change(300L, "upsert", "t", 1L, 9.0)).toDS(),
      tableDir, 2L, numBuckets = 16, retainVersions = 4)
    assert(graft.streaming.ViewLayout.currentVersion(tableDir).get == v3)
  }

  test("rebucket of a never-published table must not swallow the real batch 0") {
    // the rebucket version carries 'batch -1' (a sentinel no engine
    // batch id can equal) — without it, publishedBatch would fall back
    // to the version NAME (v0) and silently skip the first merge
    val dir = Files.createTempDirectory("graft_sink_rebucket_empty").toString
    UpsertSink.rebucket(spark, dir, 8)
    UpsertSink.mergeBatch(Seq(Change(1, "upsert", "t", 1, 1.0)).toDS(), dir, 0L, numBuckets = 8)
    assert(UpsertSink.readCurrent(spark, dir).count() == 1,
      "batch 0 after an initial rebucket must still publish")
  }

  test("property: batched merges with a mid-history rebucket equal the serial fold") {
    val rnd = new scala.util.Random(8L) // fixed seed — deterministic spec
    val tableDir = Files.createTempDirectory("graft_sink_rebucket_prop").toString
    val history = (1 to 300).map { pos =>
      val id = rnd.nextInt(40).toLong
      val op = if (rnd.nextInt(4) == 0) "delete" else "upsert"
      Change(pos.toLong, op, "t", id, pos * 0.5)
    }
    val batches = history.grouped(60).toSeq
    var nb = 4
    batches.zipWithIndex.foreach { case (b, i) =>
      UpsertSink.mergeBatch(b.toDS(), tableDir, i.toLong, numBuckets = nb, retainVersions = 2)
      if (i == 2) { UpsertSink.rebucket(spark, tableDir, 32); nb = 32 } // mid-history re-shard
    }
    val folded = history.groupBy(_.id).flatMap { case (id, ops) =>
      val last = ops.maxBy(_.pos)
      if (last.op == "upsert") Some(id -> last.value) else None
    }
    val got = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toMap
    assert(got == folded, "materialized table must equal the serial fold of the history")
  }

  test("a small batch rewrites only its touched buckets, not the table") {
    val tableDir = Files.createTempDirectory("graft_sink_bucket").toString
    val nb = 16
    // seed: 200 keys spread across (almost surely) all 16 buckets
    val b0 = (1 to 200).map(i => Change(i.toLong, "upsert", "t", i.toLong, i.toDouble)).toDS()
    UpsertSink.mergeBatch(b0, tableDir, 0L, numBuckets = nb)
    def bucketDirs(v: String): Set[String] =
      Option(new java.io.File(s"$tableDir/$v").listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("__bucket=")).map(_.getName).toSet
    val seeded = bucketDirs("v0")
    assert(seeded.size > 8, s"seed should spread over many buckets, got $seeded")

    // batch 1 touches exactly ONE key ⇒ exactly one bucket dir under v1
    UpsertSink.mergeBatch(Seq(Change(201L, "upsert", "t", 7L, 7.5)).toDS(),
      tableDir, 1L, numBuckets = nb, retainVersions = 4)
    assert(bucketDirs("v1").size == 1,
      s"one-key batch must rewrite one bucket, wrote ${bucketDirs("v1")}")
    // snapshot correctness is unchanged by the partial rewrite
    val snap = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toMap
    assert(snap(7L) == 7.5 && snap.size == 200)

    // deleting every key of one hash bucket drops that bucket from the
    // manifest (no empty dir published) and leaves the rest intact
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val byBucket = UpsertSink.readCurrent(spark, tableDir)
      .select(col("id"), pmod(xxhash64(col("tbl"), col("id")), lit(nb)).as("b"))
      .as[(Long, Long)].collect().groupBy(_._2)
    val members = byBucket.head._2
    val dels = members.zipWithIndex
      .map { case ((id, _), i) => Change(300L + i, "delete", "t", id, 0.0) }
    UpsertSink.mergeBatch(dels.toSeq.toDS(), tableDir, 2L, numBuckets = nb, retainVersions = 4)
    val after = UpsertSink.readCurrent(spark, tableDir)
      .select("id").as[Long].collect().toSet
    assert(after == (1 to 200).map(_.toLong).toSet -- members.map(_._1))
    assert(bucketDirs("v2").isEmpty, s"emptied bucket must not publish a dir: ${bucketDirs("v2")}")
  }

  test("update images end-to-end: PK-changing updates materialize exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("graft_sink_img").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_img").toString
    val in = MemoryStream[graft.streaming.ChangelogStream.ImagedChange]
    val q = UpsertSink.materialize(
      graft.streaming.ChangelogStream.expandUpdates(in.toDS()), tableDir, ckpt,
      numBuckets = 8)
    import graft.streaming.ChangelogStream.ImagedChange
    in.addData(
      ImagedChange(1, "upsert", "t", -1, 1, 1.0),
      ImagedChange(2, "upsert", "t", -1, 2, 2.0))
    q.processAllAvailable()
    in.addData(
      ImagedChange(3, "update", "t", 1, 10, 1.5), // PK change 1 → 10
      // PK swap 10 ↔ 2 in one event: same-pos tombstone + upsert per key
      ImagedChange(4, "update", "t", 10, 2, 10.5),
      ImagedChange(4, "update", "t", 2, 10, 2.6))
    q.processAllAvailable()
    q.stop()
    val snap = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toSet
    assert(snap == Set((2L, 10.5), (10L, 2.6)),
      s"old key tombstoned, swap resolved, got $snap")
  }

  test("numBuckets is recorded at creation and a mismatched merge is rejected") {
    val tableDir = Files.createTempDirectory("graft_sink_meta").toString
    UpsertSink.mergeBatch(
      Seq(Change(1L, "upsert", "t", 1L, 1.0)).toDS(), tableDir, 0L, numBuckets = 16)
    assert(UpsertSink.storedNumBuckets(tableDir).contains(16))
    // a restart passing a different bucket count would rehash keys into
    // buckets the batch never touches — stale rows would silently
    // survive; it must fail loudly instead
    val e = intercept[IllegalArgumentException] {
      UpsertSink.mergeBatch(
        Seq(Change(2L, "upsert", "t", 1L, 2.0)).toDS(), tableDir, 1L, numBuckets = 32)
    }
    assert(e.getMessage.contains("numBuckets=16"))
    // the matching count still works, and the rejected call changed nothing
    UpsertSink.mergeBatch(
      Seq(Change(2L, "upsert", "t", 1L, 2.0)).toDS(), tableDir, 1L, numBuckets = 16)
    val snap = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toSet
    assert(snap == Set((1L, 2.0)))
  }

  test("a torn manifest line is skipped, not a crash") {
    val tableDir = Files.createTempDirectory("graft_sink_torn").toString
    UpsertSink.mergeBatch(
      Seq(Change(1L, "upsert", "t", 1L, 1.0),
          Change(2L, "upsert", "t", 2L, 2.0)).toDS(), tableDir, 0L, numBuckets = 4)
    // simulate a pre-atomic-write crash artifact: a manifest whose last
    // line was truncated mid-write (no space ⇒ un-splittable)
    val manifest = java.nio.file.Paths.get(tableDir, "v0.manifest")
    val torn = new String(Files.readAllBytes(manifest), "UTF-8") + "\n3"
    Files.write(manifest, torn.getBytes("UTF-8"))
    // readers skip the torn line and still see the intact buckets
    val snap = UpsertSink.readCurrent(spark, tableDir)
      .select("id").as[Long].collect().toSet
    assert(snap == Set(1L, 2L))
    // the pruner parses retained manifests (crash orphans included) —
    // it must prune, not throw
    UpsertSink.mergeBatch(
      Seq(Change(3L, "upsert", "t", 3L, 3.0)).toDS(), tableDir, 1L, numBuckets = 4)
    UpsertSink.pruneVersions(tableDir, 2)
    assert(UpsertSink.readCurrent(spark, tableDir)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }

  test("version retention prunes manifests and unreferenced dirs, keeps shared ones") {
    val tableDir = Files.createTempDirectory("graft_sink_retain").toString
    def dirs() = new java.io.File(tableDir).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+")).map(_.getName).toSet
    def manifests() = new java.io.File(tableDir).listFiles()
      .filter(f => f.isFile && f.getName.matches("v\\d+\\.manifest")).map(_.getName).toSet

    // same key every batch ⇒ each version fully supersedes the bucket:
    // once a manifest ages out, its version dir is unreferenced and dies
    (0 to 3).foreach { b =>
      UpsertSink.mergeBatch(
        Seq(Change(b.toLong, "upsert", "t", 0L, b.toDouble)).toDS(), tableDir, b.toLong)
    }
    assert(manifests() == Set("v2.manifest", "v3.manifest"), s"got ${manifests()}")
    assert(dirs() == Set("v2", "v3"), s"superseded dirs must be pruned, got ${dirs()}")
    val cur = UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toSet
    assert(cur == Set((0L, 3.0)))

    // DIFFERENT keys: old version dirs stay alive while the current
    // manifest still references their untouched buckets — structural
    // sharing must not be broken by the pruner
    val shared = Files.createTempDirectory("graft_sink_share").toString
    (0 to 3).foreach { b =>
      UpsertSink.mergeBatch(
        Seq(Change(b.toLong, "upsert", "t", 100L + b, b.toDouble)).toDS(), shared, b.toLong)
    }
    val all = UpsertSink.readCurrent(spark, shared)
      .select("id").as[Long].collect().toSet
    assert(all == Set(100L, 101L, 102L, 103L)) // history intact via shared dirs
  }

  test("live-view zone maps: range reads on lastPos skip untouched buckets' files") {
    import org.apache.spark.sql.functions.{col, lit}
    val tableDir = Files.createTempDirectory("graft_sink_zm").toString
    // batch 0: 200 keys at pos 1..200 spread over (almost surely) all
    // 16 buckets; batch 1: two keys at pos 1000+ touching few buckets
    UpsertSink.mergeBatch(
      (1 to 200).map(i => Change(i.toLong, "upsert", "t", i.toLong, i.toDouble)).toDS(),
      tableDir, 0L, numBuckets = 16, retainVersions = 4, statsCols = Seq("lastPos"))
    UpsertSink.mergeBatch(
      Seq(Change(1001L, "upsert", "t", 7L, 7.5),
          Change(1002L, "upsert", "t", 8L, 8.5)).toDS(),
      tableDir, 1L, numBuckets = 16, retainVersions = 4, statsCols = Seq("lastPos"))

    val allFiles = UpsertSink.currentRangeFiles(spark, tableDir, "lastPos",
      lit(Long.MinValue), lit(Long.MaxValue))
    val recent = UpsertSink.currentRangeFiles(spark, tableDir, "lastPos",
      lit(1000L), lit(2000L))
    assert(recent.nonEmpty && recent.size * 2 <= allFiles.size,
      s"a recent-positions read must skip most files: ${recent.size}/${allFiles.size}")
    // result identity with the unpruned read + filter (no false skips)
    val got = UpsertSink.readCurrentRange(spark, tableDir, "lastPos",
        lit(1000L), lit(2000L))
      .select("id", "value", "lastPos").as[(Long, Double, Long)].collect().toSet
    val want = UpsertSink.readCurrent(spark, tableDir)
      .filter(col("lastPos") >= 1000L && col("lastPos") <= 2000L)
      .select("id", "value", "lastPos").as[(Long, Double, Long)].collect().toSet
    assert(got == want && got == Set((7L, 7.5, 1001L), (8L, 8.5, 1002L)))
  }

  test("versions written before stats were enabled degrade to conservative full reads") {
    import org.apache.spark.sql.functions.lit
    val tableDir = Files.createTempDirectory("graft_sink_zm_mixed").toString
    UpsertSink.mergeBatch( // no statsCols: v0 has no _zonemap
      (1 to 50).map(i => Change(i.toLong, "upsert", "t", i.toLong, i.toDouble)).toDS(),
      tableDir, 0L, numBuckets = 8, retainVersions = 4)
    UpsertSink.mergeBatch( // stats enabled from v1 on
      Seq(Change(500L, "upsert", "t", 3L, 3.5)).toDS(),
      tableDir, 1L, numBuckets = 8, retainVersions = 4, statsCols = Seq("lastPos"))
    val got = UpsertSink.readCurrentRange(spark, tableDir, "lastPos", lit(1L), lit(600L))
      .select("id", "value").as[(Long, Double)].collect().toMap
    assert(got.size == 50 && got(3L) == 3.5,
      "mixed manifest/no-manifest versions must still read exactly")
  }

  test("time travel: a retained version reads as the exact post-batch snapshot; pruned raises") {
    val tableDir = Files.createTempDirectory("graft_sink_tt").toString
    // retain 3 versions of a table evolving one key per batch
    UpsertSink.mergeBatch(Seq(
      Change(1, "upsert", "t", 1L, 1.0),
      Change(2, "upsert", "t", 2L, 2.0)).toDS(), tableDir, 0L, retainVersions = 3)
    UpsertSink.mergeBatch(Seq(
      Change(3, "upsert", "t", 1L, 9.0)).toDS(), tableDir, 1L, retainVersions = 3)
    UpsertSink.mergeBatch(Seq(
      Change(4, "delete", "t", 2L, 0.0),
      Change(5, "upsert", "t", 3L, 3.0)).toDS(), tableDir, 2L, retainVersions = 3)

    assert(UpsertSink.retainedVersions(tableDir) == Seq(0L, 1L, 2L))
    def snap(b: Long) = UpsertSink.readVersion(spark, tableDir, b)
      .select("id", "value").as[(Long, Double)].collect().toSet
    assert(snap(0L) == Set((1L, 1.0), (2L, 2.0)), "v0: the original publish")
    assert(snap(1L) == Set((1L, 9.0), (2L, 2.0)), "v1: update visible, delete not yet")
    assert(snap(2L) == Set((1L, 9.0), (3L, 3.0)), "v2 == current")
    assert(snap(2L) == UpsertSink.readCurrent(spark, tableDir)
      .select("id", "value").as[(Long, Double)].collect().toSet)

    // a fourth batch ages v0 out (retain 3) — time travel to it raises
    UpsertSink.mergeBatch(Seq(
      Change(6, "upsert", "t", 4L, 4.0)).toDS(), tableDir, 3L, retainVersions = 3)
    assert(UpsertSink.retainedVersions(tableDir) == Seq(1L, 2L, 3L))
    val e = intercept[IllegalArgumentException](snap(0L))
    assert(e.getMessage.contains("not retained") && e.getMessage.contains("1, 2, 3"),
      e.getMessage)
  }
}
