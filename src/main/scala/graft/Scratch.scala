package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hashing, TextFunctions}

/** Dev-only micro-profiler for operator stages (not part of the API). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(32)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup
    time("range sum #1")(spark.range(10000000L).selectExpr("sum(id)").collect())
    time("range sum #2")(spark.range(10000000L).selectExpr("sum(id)").collect())
    val docs = Tables.documents(spark, dir)
    time("docs count #1")(docs.count())
    time("docs count #2")(docs.count())
    val s = docs.repartition(32).select(col("doc_id"),
      Hashing.simhash(TextFunctions.tokens(col("text"))).as("sh64")).persist()
    time("simhash+count #1")(s.count())
    time("simhash+count #2 (cached)")(s.count())
    val g = s.groupBy("sh64").count()
    time("groupBy cached #1")(g.count())
    time("groupBy cached #2")(g.count())
    time("shuffle join")(
      s.as("a").join(s.as("b"), "sh64").count())
    spark.stop()
  }
}
