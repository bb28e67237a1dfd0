package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

import graft.operators.Skew
import graft.sources.Bucketed

/** Skew salting + bucketed co-located joins (SURVEY §2 E5/E6). */
class SkewBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 10k facts, 90% on one hot key, joined to a 100-key dim. */
  private lazy val facts = spark.range(10000)
    .select(col("id").as("f_id"),
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
      (col("id") * 3).as("payload"))
  private lazy val dims = spark.range(100)
    .select(col("id").as("k"), concat(lit("d"), col("id")).as("d_name"))

  private def withNoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin returns exactly the plain join's rows (inner and left)") {
    val plainInner = facts.join(dims, Seq("k"))
      .select("f_id", "k", "payload", "d_name").as[(Long, Long, Long, String)]
      .collect().toSet
    val saltedInner = Skew.saltedJoin(facts, dims, Seq("k"), col("f_id"), 8)
      .select("f_id", "k", "payload", "d_name").as[(Long, Long, Long, String)]
      .collect().toSet
    assert(saltedInner == plainInner)

    // left join with dim misses: keys >= 100 never match
    val factsMiss = facts.withColumn("k", col("k") + 60)
    val plainLeft = factsMiss.join(dims, Seq("k"), "left")
      .select("f_id", "d_name").as[(Long, Option[String])].collect().toSet
    val saltedLeft = Skew.saltedJoin(factsMiss, dims, Seq("k"), col("f_id"), 8, "left")
      .select("f_id", "d_name").as[(Long, Option[String])].collect().toSet
    assert(saltedLeft == plainLeft)
  }

  test("saltedJoin spreads the hot key across buckets (salt reaches the join key)") {
    withNoBroadcast {
      val salted = Skew.saltedJoin(facts, dims, Seq("k"), col("f_id"), 8)
      val plan = TestSpark.fullPlan(salted)
      assert(plan.contains("__salt"), "salt column must be part of the join")
      // distinct salts actually used by the hot key — all 8 buckets hit
      val hotSalts = facts
        .withColumn("__salt",
          pmod(graft.functions.Hashing.hashLong64(col("f_id"), 23L), lit(8)))
        .where(col("k") === 7).select("__salt").distinct().count()
      assert(hotSalts == 8, s"hot key should scatter over 8 salts, got $hotSalts")
    }
  }

  test("salted plan balances a 1000× hot key across shuffle partitions (measured)") {
    // static-plan evidence: AQE off so neither skew-split nor coalesce
    // rewrites the exchanges — salting is the control for exactly the
    // plans AQE cannot rescue (see Skew scaladoc)
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try withNoBroadcast {
      // 20k facts, 95% on hot key 7 (≈1900× the cold keys' share)
      val hot = spark.range(20000)
        .select(col("id").as("f_id"),
          when(col("id") % 20 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"))
      def partCounts(df: org.apache.spark.sql.DataFrame): Array[Long] =
        df.withColumn("pid", spark_partition_id())
          .groupBy("pid").count().select("count").as[Long].collect()
      val plain = partCounts(hot.join(dims, Seq("k")))
      val salted = partCounts(Skew.saltedJoin(hot, dims, Seq("k"), col("f_id"), 32))
      assert(plain.sum == salted.sum, "same join result cardinality")
      assert(plain.max >= (plain.sum * 0.9).toLong,
        s"unsalted: hot key concentrates in one partition (max ${plain.max}/${plain.sum})")
      // salted: every shuffle partition close to the ideal even share
      // (32 salts spread the hot key over all partitions; measured
      // max/ideal ≈ 1.37 with the deterministic salt hash)
      val ideal = salted.sum.toDouble / salted.length
      assert(salted.max <= (ideal * 1.6).toLong,
        s"salted max partition ${salted.max} vs ideal $ideal (plain max was ${plain.max})")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("saltedJoin left_semi/left_anti match their plain counterparts") {
    val factsMiss = facts.withColumn("k", col("k") + 60) // some keys miss dims
    for (jt <- Seq("left_semi", "left_anti")) {
      val plain = factsMiss.join(dims, Seq("k"), jt)
        .select("f_id").as[Long].collect().toSet
      val salted = Skew.saltedJoin(factsMiss, dims, Seq("k"), col("f_id"), 8, jt)
        .select("f_id").as[Long].collect().toSet
      assert(salted == plain, s"$jt mismatch")
    }
  }

  test("saltedJoin rejects join types the replication would corrupt") {
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(facts, dims, Seq("k"), col("f_id"), 8, "full_outer")
    }
    assert(e.getMessage.contains("not salt-safe"))
  }

  test("bucketed tables co-located on the key join with zero shuffle exchanges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    Bucketed.write(facts, "b_facts", "k", 8, s"$dir/facts")
    Bucketed.write(dims, "b_dims", "k", 8, s"$dir/dims")
    withNoBroadcast {
      val joined = Bucketed.read(spark, "b_facts")
        .join(Bucketed.read(spark, "b_dims"), Seq("k"))
      val plan = TestSpark.fullPlan(joined)
      val shuffles = raw"\(\d+\) Exchange\b".r.findAllIn(plan).size
      assert(shuffles == 0, s"expected shuffle-free co-located join, plan:\n$plan")
      assert(plan.contains("SortMergeJoin"), "co-located path is a sort-merge join")
      assert(joined.count() == facts.join(dims, Seq("k")).count())
    }
    spark.sql("DROP TABLE IF EXISTS b_facts")
    spark.sql("DROP TABLE IF EXISTS b_dims")
  }
}
