package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions

/** SQL-registered native functions (SURVEY §2 — SparkSessionExtensions
  * surface). Uses its own session: extensions bind at build time. */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // extensions only apply at session construction: clear the
    // default/active handles so getOrCreate builds a fresh session
    // (reusing the shared SparkContext), then restore the default
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions).getOrCreate()
    SparkSession.setDefaultSession(base)
    s
  }

  test("graft_* functions are callable from SQL and match the Column API") {
    val viaSql = spark.sql(
      "SELECT graft_fingerprint('hello world') AS fp").collect()(0).getLong(0)
    assert(viaSql == graft.functions.Hashing.hash64("hello world".getBytes("UTF-8"), 3L))
    val cos = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))," +
        " array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val mh = spark.sql(
      "SELECT size(graft_minhash(graft_shingles3(split('a b c d e', ' ')))) AS n")
      .collect()(0).getInt(0)
    assert(mh == 128)
    val si = spark.sql(
      "SELECT graft_sorted_intersect(array(1L, 2L, 5L), array(2L, 3L, 5L)) AS i")
      .collect()(0).getInt(0)
    assert(si == 2)
  }

  test("round-4 functions: token/rep stats structs and seeded long hash") {
    val ts = spark.sql(
      "SELECT graft_token_stats(split('the a the data', ' ')).n_the AS n").collect()(0).getInt(0)
    assert(ts == 2)
    val rs = spark.sql(
      "SELECT graft_rep_stats(split('x x y', ' ')).top_n AS t").collect()(0).getInt(0)
    assert(rs == 2)
    val h = spark.sql("SELECT graft_hashlong(42L, 13) AS h").collect()(0).getLong(0)
    assert(h == graft.functions.Hashing.hashLong(42L, 13L))
    // 64-bit literal seed accepted (BIGINT path, r4 ADVICE fix)
    val h64 = spark.sql("SELECT graft_hashlong(42L, 8589934592L) AS h").collect()(0).getLong(0)
    assert(h64 == graft.functions.Hashing.hashLong(42L, 8589934592L))
  }

  test("graft_shinglesn generalizes the 3-gram surface to any literal width") {
    // n = 3 must agree with graft_shingles3 exactly
    val a = spark.sql("SELECT graft_shinglesn(split('a b c d e', ' '), 3) AS s")
      .collect()(0).getSeq[Long](0)
    val b = spark.sql("SELECT graft_shingles3(split('a b c d e', ' ')) AS s")
      .collect()(0).getSeq[Long](0)
    assert(a == b)
    // 5-gram of 5 tokens: exactly one shingle; width > length: none
    val n5 = spark.sql("SELECT size(graft_shinglesn(split('a b c d e', ' '), 5)) AS n")
      .collect()(0).getInt(0)
    assert(n5 == 1)
    val n9 = spark.sql("SELECT size(graft_shinglesn(split('a b c', ' '), 9)) AS n")
      .collect()(0).getInt(0)
    assert(n9 == 0)
  }

  test("non-literal parameter args raise AnalysisException, not NPE") {
    import spark.implicits._
    val df = Seq((Array("a", "b", "c", "d"), 4)).toDF("toks", "n")
    df.createOrReplaceTempView("gx_neg")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash(graft_shingles3(toks), n) FROM gx_neg").collect()
    }
    assert(e1.getCondition == "NON_FOLDABLE_ARGUMENT", e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT graft_bandhash(graft_minhash(graft_shingles3(toks)), n, 8) FROM gx_neg").collect()
    }
    assert(e2.getCondition == "NON_FOLDABLE_ARGUMENT", e2.getMessage)
  }

  test("fractional literal parameters raise instead of silently truncating") {
    // graft_hashlong(x, 1.5) used to truncate the seed to 1 via
    // Number.longValue() — a wrong-but-running query
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hashlong(42L, 1.5)").collect()
    }
    assert(e1.getCondition == "NON_FOLDABLE_ARGUMENT", e1.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_minhash(graft_shingles3(split('a b c d', ' ')), 2.0)").collect()
    }
    assert(e2.getCondition == "NON_FOLDABLE_ARGUMENT", e2.getMessage)
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hashlong(42L, CAST(1.5 AS DOUBLE))").collect()
    }
    assert(e3.getCondition == "NON_FOLDABLE_ARGUMENT", e3.getMessage)
    // integral widths/seeds of any integer type still work
    assert(spark.sql("SELECT graft_hashlong(42L, CAST(13 AS TINYINT)) = graft_hashlong(42L, 13)")
      .collect()(0).getBoolean(0))
  }

  test("sketch aggregates from SQL: graft_kmv / graft_cms match the Column API") {
    import org.apache.spark.sql.functions.{col, lit}
    spark.range(10000)
      .select((col("id") % 5).cast("string").as("g"), (col("id") % 321).as("v"))
      .createOrReplaceTempView("gx_agg")
    // KMV: SQL aggregate == Column-API aggregate, group by group
    val sqlKmv = spark.sql(
      """SELECT g, graft_kmv(graft_hashlong(v, 7), 64) AS kmv
        |FROM gx_agg GROUP BY g""".stripMargin)
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toMap
    val colKmv = spark.table("gx_agg")
      .groupBy(col("g"))
      .agg(graft.functions.Sketches.kMinValues(
        graft.functions.Hashing.hashLong64(col("v"), 7L), 64).as("kmv"))
      .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toMap
    assert(sqlKmv == colKmv)
    // CMS: the SQL matrix answers point queries identically
    val sqlCms = spark.sql(
      "SELECT graft_cms(graft_hashlong(v, 0), 4, 128) AS cms FROM gx_agg")
      .collect()(0).getSeq[Long](0)
    val colCms = spark.table("gx_agg")
      .agg(graft.functions.Sketches.countMin(
        graft.functions.Hashing.hashLong64(col("v"), 0L), 4, 128).as("cms"))
      .collect()(0).getSeq[Long](0)
    assert(sqlCms == colCms)
    // parameter hygiene matches the rest of the surface
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_kmv(graft_hashlong(v, 7), v) FROM gx_agg").collect()
    }
    assert(e.getCondition == "NON_FOLDABLE_ARGUMENT", e.getMessage)
  }

  test("graft_zvalue interleaves like the operator, default and explicit bits") {
    val r = spark.sql(
      "SELECT graft_zvalue(3L, 2L, 4) AS a, graft_zvalue(65535L, 0L) AS b")
      .collect()(0)
    assert(r.getLong(0) == 13L)
    assert(r.getLong(1) == 0x55555555L) // 16 one-bits at even positions
    val viaOp = spark.range(1).select(
      graft.operators.ZOrder.zValue(
        org.apache.spark.sql.functions.lit(12345L),
        org.apache.spark.sql.functions.lit(54321L)).as("z")).collect()(0).getLong(0)
    val viaSql = spark.sql("SELECT graft_zvalue(12345L, 54321L) AS z")
      .collect()(0).getLong(0)
    assert(viaOp == viaSql)
  }
}
