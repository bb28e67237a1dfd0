package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.ChangelogStream
import graft.streaming.ChangelogStream.Change

/** The streaming operators run unchanged on the RocksDB state store —
  * the provider a 100 TB deployment uses (per-key state lives off-heap
  * / on local SSD instead of the default provider's executor heap, so
  * entityState over billions of keys is bounded by disk, not memory;
  * changelog checkpointing ships deltas instead of full snapshots).
  * The operators never touch provider APIs — state flows through
  * `flatMapGroupsWithState` — so this is a contract test: same fold,
  * same answers, RocksDB metrics actually reported (proving the
  * provider was in force, not silently defaulted).
  */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("entityState folds identically on RocksDBStateStoreProvider, across a restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("rocksdb_state").toString
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[Change]
      // memory sink cannot recover from a checkpoint; foreachBatch can
      val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double, Boolean)]()
      def start() = ChangelogStream.entityState(in.toDS())
        .writeStream.foreachBatch {
          (b: org.apache.spark.sql.Dataset[ChangelogStream.Entity], _: Long) =>
            b.collect().foreach(e => out.add((e.id, e.lastPos, e.value, e.live)))
        }
        .option("checkpointLocation", ckpt).outputMode("update").start()

      val q1 = start()
      in.addData(
        Change(1, "upsert", "t", 1, 1.0),
        Change(2, "upsert", "t", 2, 2.0),
        Change(3, "upsert", "t", 1, 5.0))
      q1.processAllAvailable()
      // the provider must actually be RocksDB: its custom metrics are
      // provider-specific and absent under the default HDFS-backed store
      val metrics = q1.lastProgress.stateOperators.head.customMetrics.keySet()
      assert(metrics.toString.toLowerCase.contains("rocksdb"),
        s"expected RocksDB state metrics, got $metrics")
      q1.stop()

      // restart from the checkpoint: RocksDB state must resume the fold
      val q2 = start()
      in.addData(Change(4, "delete", "t", 2, 0.0), Change(5, "upsert", "t", 3, 7.0))
      q2.processAllAvailable(); q2.stop()

      import scala.jdk.CollectionConverters._
      val last = out.asScala.groupBy(_._1).map { case (id, rows) =>
        val r = rows.maxBy(_._2); (id, r._3, r._4)
      }.toSet
      assert(last == Set((1L, 5.0, true), (2L, 0.0, false), (3L, 7.0, true)))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
