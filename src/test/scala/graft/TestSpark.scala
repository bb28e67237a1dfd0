package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Spark re-uses the first
  * session in the JVM anyway; suites must not stop() it). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.local(4)
    // plan AUDITS grep full formatted plans — lift the session
    // profiles' 64 KB plan-string budget (truncation would silently
    // hide Exchange/Scan nodes from the assertions)
    s.conf.set("spark.sql.maxPlanStringLength", (Int.MaxValue - 15).toString)
    s
  }
}
