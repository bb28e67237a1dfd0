package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Generic adaptive-bucket range join (SURVEY §2 C10). */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("overlapping intervals each match; outside points match nothing") {
    val pts = Seq(5L, 15L, 25L, 99L).toDF("p")
    val iv = Seq(
      ("a", 0L, 20L),     // contains 5, 15
      ("b", 10L, 30L),    // contains 15, 25
      ("c", 200L, 300L)   // outside the observed point range → pruned
    ).toDF("name", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, "p", iv, "lo", "hi")
      .select("p", "name").as[(Long, String)].collect().toSet
    assert(out == Set((5L, "a"), (15L, "a"), (15L, "b"), (25L, "b")))
  }

  test("sparse 64-bit offsets: bucket count stays ~2^16, no sequence overflow") {
    // positions spread over a ~10^18 range — a fixed bucket width would
    // need ~10^14 bucket rows and overflow sequence()
    val big = 1_000_000_000_000_000_000L
    val pts = Seq(0L, big / 2, big).toDF("p")
    val iv = Seq(("lo", -1L, big / 2 + 1), ("hi", big / 2, big + 1)).toDF("name", "lo", "hi")
    val out = RangeJoin.pointInInterval(pts, "p", iv, "lo", "hi")
      .select("p", "name").as[(Long, String)].collect().toSet
    assert(out == Set((0L, "lo"), (big / 2, "lo"), (big / 2, "hi"), (big, "hi")))
  }

  test("matches a plain theta-join on real events") {
    val log = graft.cdc.Changelog.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val iv = log.filter(col("etype") === "signup")
      .select(col("id").as("iv_id"), col("pos").as("lo"), (col("pos") + 100).as("hi"))
    val pts = log.filter(col("etype") === "error").select(col("pos"))
    val bucketed = RangeJoin.pointInInterval(pts, "pos", iv, "lo", "hi")
      .select("pos", "iv_id").as[(Long, Long)].collect().toSet
    val theta = pts.join(iv, col("pos") >= col("lo") && col("pos") < col("hi"))
      .select("pos", "iv_id").as[(Long, Long)].collect().toSet
    assert(bucketed == theta)
  }
}
