package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sinks.PartitionedSink

/** Dynamic-partition-overwrite day sink (SURVEY §2 E8). */
class PartitionedSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day1us = 1704103200000000L // 2024-01-01 10:00 UTC
  private val day2us = 1704189600000000L // 2024-01-02 10:00 UTC

  test("backfilling one day replaces only that day's partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft_psink").toString
    Seq((1L, day1us, 1.0), (2L, day2us, 2.0))
      .toDF("pos", "us", "val")
      .pipe(df => PartitionedSink.writeByDay(df, dir))
    // re-run day 2 only, with corrected values
    Seq((2L, day2us, 99.0))
      .toDF("pos", "us", "val")
      .pipe(df => PartitionedSink.writeByDay(df, dir))
    val all = spark.read.parquet(dir).select("pos", "val")
      .as[(Long, Double)].collect().toSet
    assert(all == Set((1L, 1.0), (2L, 99.0)),
      "day 1 untouched, day 2 replaced — dynamic overwrite")
  }

  test("day readback prunes partitions at the source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_psink2").toString
    PartitionedSink.writeByDay(
      Seq((1L, day1us, 1.0), (2L, day2us, 2.0)).toDF("pos", "us", "val"), dir)
    val df = PartitionedSink.readDay(spark, dir, "2024-01-01")
    val plan = TestSpark.fullPlan(df)
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-01"),
      s"day predicate must prune partitions:\n$plan")
    assert(df.select("pos").as[Long].collect().toSeq == Seq(1L))
  }

  private implicit class Piped[A](a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
