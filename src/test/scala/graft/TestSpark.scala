package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.FormattedMode

/** One shared local session for all suites (Spark re-uses the first
  * session in the JVM anyway; suites must not stop() it). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local(4)
  // The shared session keeps the profiles' 64 KB plan-string budget:
  // AQE rebuilds the FULL formatted plan string on every stage update
  // (AdaptiveSparkPlanExec.onUpdatePlan → explainString), so lifting
  // the cap session-wide makes every deep-lineage suite (the chained
  // E2E pipelines build multi-megachar plans) pay O(plan chars) of
  // single-threaded driver time per replan — a large slice of the r18
  // 59-minute suite wall. Audits that grep complete plans lift the
  // (runtime-settable) budget around the explainString call only.
  private val planLock = new Object
  private val capKey = "spark.sql.maxPlanStringLength"

  /** Complete FormattedMode plan regardless of the session's plan-
    * string cap — truncation would silently hide Exchange/Scan nodes
    * from grep-based assertions. Synchronized: the conf is session-
    * scoped, so concurrent suites must not observe a half-restored cap
    * while building their own audited plan text. */
  def fullPlan(df: Dataset[_]): String = planLock.synchronized {
    val prev = spark.conf.get(capKey)
    spark.conf.set(capKey, (Int.MaxValue - 15).toString)
    try df.queryExecution.explainString(FormattedMode)
    finally spark.conf.set(capKey, prev)
  }
}
