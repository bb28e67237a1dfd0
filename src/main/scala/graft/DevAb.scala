package graft

import org.apache.spark.sql.SparkSession

/** Dev-only interleaved A/B timer: for each named query, alternates a
  * session conf between two values, several repeats each, and reports
  * per-variant MIN wall (min-of-N cancels this host's starvation
  * phases far better than mean/median across processes). Not part of
  * the library API.
  *
  * Usage: runMain graft.DevAb <confKey> <valA> <valB> <reps> <query...>
  */
object DevAb {
  def main(args: Array[String]): Unit = {
    val Array(key, valA, valB, repsS, names @ _*) = args: @unchecked
    val reps = repsS.toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.fromEnv(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-ab"),
      cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // '-' means "the session default" — capture it ONCE up front and
    // RESTORE it for that arm, otherwise from the second repetition on
    // the '-' arm would inherit the other arm's conf value and the A/B
    // comparison measures nothing.
    val orig = spark.conf.getOption(key)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def once(v: String): Double = {
        if (v != "-") spark.conf.set(key, v)
        else orig.fold(spark.conf.unset(key))(spark.conf.set(key, _))
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        try df.write.format("noop").mode("overwrite").save()
        finally graft.operators.Dedup.release(df)
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 0 until reps) { as += once(valA); bs += once(valB) }
      println(f"[ab] $n%-26s A=$valA min=${as.min}%7.2f all=${as.map(x => f"$x%.2f").mkString(",")}")
      println(f"[ab] $n%-26s B=$valB min=${bs.min}%7.2f all=${bs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
