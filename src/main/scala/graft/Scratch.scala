package graft

/** Dev-only micro-profiler: times named SparkEntry queries at
  * SPARK_GRAFT_SF_DIR (not part of the library API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach {
      case "entry" =>
        println("[scratch] entry rows = " + SparkEntry.entry(spark).count())
      case n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[scratch] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        spark.catalog.clearCache()
    }
    spark.stop()
  }
}
