package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

import graft.operators.AsOf

/** As-of join semantics (SURVEY §2 C8): inclusive tie matching, NULL
  * payload integrity, unmatched-left NULLs, single-exchange plan. */
class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("each left row matches the latest right row at-or-before its time, per key") {
    val l = Seq((1L, 10L, "L1"), (1L, 20L, "L2"), (2L, 5L, "L3"))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 10L, 100L), (1L, 15L, 150L), (2L, 99L, 200L))
      .toDF("k", "t", "rv")
    val out = AsOf.join(l, r, Seq("k"), "t", "t")
      .select("k", "t", "lv", "asof_t", "asof_rv")
      .as[(Long, Long, String, Option[Long], Option[Long])].collect().toSet
    assert(out == Set(
      (1L, 10L, "L1", Some(10L), Some(100L)), // inclusive: right AT left time matches
      (1L, 20L, "L2", Some(15L), Some(150L)), // latest preceding, not first
      (2L, 5L, "L3", None, None)))            // nothing precedes → NULLs
  }

  test("a matched right row with NULL fields never mixes payloads across rows") {
    val l = Seq((1L, 30L)).toDF("k", "t")
    // latest right row has a NULL payload field; an older one has it set —
    // a per-column last(ignoreNulls) would wrongly resurrect the 111
    val r = Seq((1L, 10L, Some(111L), "old"), (1L, 20L, None: Option[Long], "new"))
      .toDF("k", "t", "a", "b")
    val out = AsOf.join(l, r, Seq("k"), "t", "t")
      .select("asof_t", "asof_a", "asof_b")
      .as[(Long, Option[Long], String)].collect().toSeq
    assert(out == Seq((20L, None, "new")), "all fields must come from the SAME right row")
  }

  test("plan: one hash exchange on the key, no join node, no range explosion") {
    val l = Seq((1L, 10L, "x")).toDF("k", "t", "lv")
    val r = Seq((1L, 5L, 1L)).toDF("k", "t", "rv")
    val p = TestSpark.fullPlan(AsOf.join(l, r, Seq("k"), "t", "t"))
    val shuffles = raw"\(\d+\) Exchange\b".r.findAllIn(p).size
    assert(shuffles <= 2, s"union sides may each shuffle once at most, got $shuffles:\n$p")
    assert(!p.contains("Join"), "as-of must compile to union+window, not a pairwise join")
  }

  test("matches the oracle shape on real events (spot check vs driver-side fold)") {
    val log = graft.cdc.Changelog.fromEvents(Tables.events(spark, "/root/testdata/sf0.001"))
    val l = log.filter(col("etype") === "purchase").select(col("id"), col("pos"))
    val r = log.filter(col("etype") === "view").select(col("id"), col("pos").as("vpos"))
    val out = AsOf.join(l, r, Seq("id"), "pos", "vpos")
      .as[(Long, Long, Option[Long])].collect()
    val views = r.as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { case (id, pos, got) =>
      val expect = views.getOrElse(id, Array.empty[Long]).takeWhile(_ <= pos).lastOption
      assert(got == expect, s"id=$id pos=$pos")
    }
  }
}
