package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (Spark re-uses the first
  * session in the JVM anyway; suites must not stop() it). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local(4)
}
