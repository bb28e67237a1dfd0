package graft

/** Dev-only micro-profiler: times named SparkEntry queries at
  * SPARK_GRAFT_SF_DIR (not part of the library API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // per-query job/stage counters: eager operators (localCheckpoint
    // results) have trivial explain plans, so the driver-synchronized
    // job count is the structural before/after evidence
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach {
      case "entry" =>
        println("[scratch] entry rows = " + SparkEntry.entry(spark).count())
      case n =>
        jobs.set(0); stages.set(0)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        try df.write.format("noop").mode("overwrite").save()
        finally graft.operators.Dedup.release(df)
        println(f"[scratch] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
          f"  jobs=${jobs.get}%3d stages=${stages.get}%3d")
        spark.catalog.clearCache()
    }
    spark.stop()
  }
}
