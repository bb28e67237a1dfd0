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

  test("version retention keeps current + previous, prunes older") {
    val tableDir = Files.createTempDirectory("graft_sink_retain").toString
    def dirs() = new java.io.File(tableDir).listFiles()
      .filter(f => f.isDirectory && f.getName.matches("v\\d+")).map(_.getName).toSet
    (0 to 3).foreach { b =>
      UpsertSink.mergeBatch(
        Seq(Change(b.toLong, "upsert", "t", b.toLong, b.toDouble)).toDS(), tableDir, b.toLong)
    }
    assert(dirs() == Set("v2", "v3"), s"got ${dirs()}")
    val cur = UpsertSink.readCurrent(spark, tableDir)
      .select("id").as[Long].collect().toSet
    assert(cur == Set(0L, 1L, 2L, 3L)) // history intact in the snapshot
  }
}
