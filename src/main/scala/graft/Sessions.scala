package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession builders for the graft engine.
  *
  * Local testing runs `local[32]` in one JVM; the settings below are the
  * ones that transfer to a 1000-executor cluster unchanged (AQE, skew
  * handling, UTC, broadcast threshold). `shuffle.partitions` is sized to
  * the local core count — on a real cluster leave AQE's coalescing to
  * pick the effective number.
  */
object Sessions {

  /** Apply graft's standard configuration to a builder. */
  def tune(b: SparkSession.Builder, shufflePartitions: Int = 32): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // single-parquet-file tables must still fan out across cores:
      // with the 128m default, a 20 MB file is ONE partition and every
      // scan-heavy stage runs on one thread
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      // JVM case mappings: Spark 4's ICU path (UTF8_BINARY upper/lower)
      // has a very expensive static init and per-char ICU calls; our
      // data is ASCII where JVM semantics are identical
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")

  /** Standalone local session (tests / benchmarks). */
  def local(cores: Int = 32): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cores]").appName("graft"), cores)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
