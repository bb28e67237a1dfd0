package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.Changelog

/** Skew probe for the CDC fold key (r13 verdict Next-round #7):
  * `cdc_entity_state` / `cdc_apply` shuffle by (tbl, id), and a hot
  * entity — the celebrity row every real changelog has — is the
  * classic skew that melts a naive per-key window (one task owns the
  * whole hot key). This instrument measures the fold on a UNIFORM
  * changelog vs a deliberately skewed one (a single key owning
  * `hotShare` of all rows, Zipf-ish tail over the rest) at the same
  * row volume, and records whether the plan carries the map-side
  * partial [[org.apache.spark.sql.execution.window.WindowGroupLimitExec]].
  *
  * Why the fold survives skew WITHOUT salting: `lastOpPerKey` is
  * `row_number over (partition by tbl,id order by pos desc) = 1`, and
  * Spark's WindowGroupLimit rewrite runs a PARTIAL top-1-per-key pass
  * in each map task BEFORE the exchange — the hot key leaves each map
  * task as ONE row, so at most `numPartitions` hot rows ever cross
  * the wire regardless of the key's share. (AQE skew-join splitting
  * does not apply to window exchanges; the group-limit pushdown is
  * what does this job.) The probe's pass line is zipf/uniform ≤ 2×;
  * if a future refactor replaces the rn=1 filter with something the
  * rewrite cannot see, this artifact catches the regression.
  *
  * `runMain graft.SkewProbe [rows] [keys] [hotShare]` → one JSON line
  * + `$SPARK_GRAFT_SKEW_OUT` (default `SKEW_LAST.json`). */
object SkewProbe {

  def main(args: Array[String]): Unit = {
    val rows = if (args.length >= 1) args(0).toLong else 8000000L
    val keys = if (args.length >= 2) args(1).toLong else 100000L
    val hotShare = if (args.length >= 3) args(2).toDouble else 0.4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = Sessions.fromEnv(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-skewprobe"),
      cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup

    // a synthetic changelog in the Changelog.fromEvents column shape:
    // pos strictly increasing, 1-in-11 deletes, value a cheap function
    // of pos. `idOf` is the only difference between the two corpora.
    def log(idOf: org.apache.spark.sql.Column): DataFrame =
      spark.range(rows).select(
        col("id").as("pos"),
        when(col("id") % 11 === 0, lit("delete")).otherwise(lit("upsert")).as("op"),
        lit("t").as("tbl"),
        idOf.as("id"),
        (col("id") % 997).cast("double").as("val"))

    val uniformId = pmod(xxhash64(col("id")), lit(keys))
    // skewed: `hotShare` of rows land on key 0; the rest follow a
    // Zipf-ish tail (hash squashed quadratically toward small ids)
    val u = pmod(xxhash64(col("id"), lit(7L)), lit(1000000L)).cast("double") / 1000000.0
    val zipfId = when(pmod(xxhash64(col("id"), lit(13L)), lit(1000L)) <
        lit((hotShare * 1000).toLong), lit(0L))
      .otherwise((u * u * keys).cast("long") + 1)

    def timeFold(idOf: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      Changelog.entityState(log(idOf)).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // plan audit: the partial group-limit must sit below the exchange
    val plan = Changelog.entityState(log(zipfId)).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val hasGroupLimit = plan.contains("WindowGroupLimit")

    // interleave two samples each, keep the min (steadier than mean
    // under a shared-host JIT/IO noise floor)
    val uniSec = Seq(timeFold(uniformId), timeFold(uniformId)).min
    val zipfSec = Seq(timeFold(zipfId), timeFold(zipfId)).min
    val ratio = zipfSec / uniSec
    System.err.println(f"[skewprobe] uniform=$uniSec%.2f s zipf=$zipfSec%.2f s " +
      f"ratio=$ratio%.2f groupLimit=$hasGroupLimit")

    val line = f"""{"metric":"skewprobe","rows":$rows,"keys":$keys,""" +
      f""""hot_share":$hotShare,"uniform_sec":$uniSec%.3f,"zipf_sec":$zipfSec%.3f,""" +
      f""""ratio":$ratio%.3f,"window_group_limit":$hasGroupLimit}"""
    println(line)
    val outPath = Paths.get(sys.env.getOrElse("SPARK_GRAFT_SKEW_OUT", "SKEW_LAST.json"))
    Files.writeString(outPath, line + "\n")
    spark.stop()
  }
}
