package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

import graft.operators.Dq

/** Data-quality checks (SURVEY §2 E12): exact violation counting,
  * clean data passes clean, and the one-scan plan shape. */
class DqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def frame() = Seq(
    (1L, Option(10L), 5.0, "O"),
    (2L, Option(20L), -1.0, "F"),   // negative price
    (3L, None, 7.0, "O"),           // null key
    (3L, Option(30L), 8.0, "Z"),    // dup id + bad status
    (4L, Option(99L), 9.0, "P")     // orphan custkey (no parent 99)
  ).toDF("id", "custkey", "price", "status")

  test("row-local rules + uniqueness count exactly their violations") {
    val out = Dq.check(frame(), Seq(
        Dq.Rule("custkey_not_null", col("custkey").isNull),
        Dq.Rule("price_nonneg", col("price") < 0),
        Dq.Rule("status_accepted", !col("status").isin("O", "F", "P"))),
        uniqueKeys = Seq(("id_unique", col("id"))))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      "custkey_not_null" -> ((1L, 5L)),
      "price_nonneg" -> ((1L, 5L)),
      "status_accepted" -> ((1L, 5L)),
      "id_unique" -> ((1L, 5L))))
  }

  test("uniqueness counts over non-null keys only (nulls are the not-null rule's)") {
    val out = Dq.check(frame(), Nil,
        uniqueKeys = Seq(("custkey_unique", col("custkey"))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // custkeys: 10, 20, NULL, 30, 99 — four non-null, all distinct
    assert(out("custkey_unique") == 0L,
      "a NULL key must not read as a duplicate")
  }

  test("rule names with dots/backticks are data, not column references") {
    // aggregates alias positionally — a hostile rule name can never
    // break col() resolution
    val out = Dq.check(frame(), Seq(
        Dq.Rule("price.non`neg", col("price") < 0),
        Dq.Rule("status in {O,F,P}", !col("status").isin("O", "F", "P"))),
        uniqueKeys = Seq(("id.unique", col("id"))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map(
      "price.non`neg" -> 1L, "status in {O,F,P}" -> 1L, "id.unique" -> 1L))
  }

  test("clean data yields zero violations on every rule") {
    val clean = frame().filter(col("id") === 1)
    val out = Dq.check(clean, Seq(
        Dq.Rule("price_nonneg", col("price") < 0)),
        uniqueKeys = Seq(("id_unique", col("id"))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.values.forall(_ == 0L))
  }

  test("refIntegrity counts orphans; NULL child keys are not orphans") {
    val parents = Seq(10L, 20L, 30L).toDF("pk")
    val r = Dq.refIntegrity("custkey_in_parent", frame(), "custkey", parents, "pk")
      .collect()(0)
    assert(r.getString(0) == "custkey_in_parent")
    assert(r.getLong(1) == 1L, "only custkey 99 is an orphan — NULL is not")
    assert(r.getLong(2) == 5L)
  }

  test("plan: all row-local rules + uniqueness fold in ONE scan") {
    val p = TestSpark.fullPlan(Dq.check(frame(), Seq(
        Dq.Rule("a", col("price") < 0),
        Dq.Rule("b", col("custkey").isNull)),
        uniqueKeys = Seq(("u", col("id")))))
    assert(raw"\(\d+\) Scan\b".r.findAllIn(p).size <= 1,
      s"adding a rule must add a counter, not a pass:\n$p")
    assert(!p.contains("Expand"),
      s"single count_distinct must not Expand:\n$p")
  }
}
