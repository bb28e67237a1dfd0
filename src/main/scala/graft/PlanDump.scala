package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only: writes `.explain("formatted")` for named SparkEntry
  * queries to `plans/<tag>/<name>_<suffix>.txt` — the before/after
  * plan artifacts the optimization rounds commit. Not part of the
  * library API.
  *
  * Usage: runMain graft.PlanDump <tag> <suffix> [query ...]
  * (no query args = all queries).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.fromEnv(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-plandump"),
      cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // committed plan artifacts must be complete — lift the session
    // profiles' 64 KB plan-string budget for this tool
    spark.conf.set("spark.sql.maxPlanStringLength", (Int.MaxValue - 15).toString)
    Files.createDirectories(Paths.get(s"plans/$tag"))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"plans/$tag/${n}_$suffix.txt"), txt)
        graft.operators.Dedup.release(df)
        System.err.println(s"[plandump] $n ok (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $n FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
