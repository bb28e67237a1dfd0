package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sinks.ZoneMap

class ZoneMapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("zone maps skip non-intersecting files; pruned read equals full filter") {
    val dir = tmp("graft_zonemap")
    val df = spark.range(1000).select(col("id").as("k"), (col("id") * 7).as("v"))
      .repartitionByRange(8, col("k"))
    ZoneMap.write(df, dir, Seq("k"))
    val manifest = spark.read.parquet(s"$dir/_zonemap")
    val nFiles = manifest.count()
    assert(nFiles >= 4, "range repartition should yield several files")
    // a narrow range touches few zones
    val cand = ZoneMap.candidateFiles(spark, dir, "k", lit(100L), lit(150L))
    assert(cand.size < nFiles, "most files must be SKIPPED for a narrow range")
    val got = ZoneMap.readRange(spark, dir, "k", lit(100L), lit(150L))
      .as[(Long, Long)].collect().toSet
    val want = (100L to 150L).map(k => (k, k * 7)).toSet
    assert(got == want, "no false skips: pruned read ≡ full scan + filter")
    // out-of-range: zero candidates, empty result, schema intact
    val none = ZoneMap.readRange(spark, dir, "k", lit(5000L), lit(6000L))
    assert(none.count() == 0 && none.columns.toSeq == Seq("k", "v"))
  }

  test("zone maps cash in a z-ordered layout: range reads skip files in BOTH dimensions") {
    val dir = tmp("graft_zonemap_z")
    val n = 1 << 12 // a 64 x 64 grid
    val df = spark.range(n).select(
      (col("id") % 64).as("x"), expr("id div 64").as("y"), col("id").as("v"))
    val z = df
      .withColumn("__z", graft.operators.ZOrder.zValue(col("x"), col("y"), 6))
      .repartitionByRange(16, col("__z")).sortWithinPartitions(col("__z"))
      .drop("__z")
    ZoneMap.write(z, dir, Seq("x", "y"))
    val nFiles = spark.read.parquet(s"$dir/_zonemap").count()
    assert(nFiles >= 8)
    // each file covers one compact z-interval = a tight (x, y) tile,
    // so a narrow range on EITHER dimension eliminates most files —
    // the property a 1-D sort can only give to its sort column
    val cx = ZoneMap.candidateFiles(spark, dir, "x", lit(0L), lit(15L))
    val cy = ZoneMap.candidateFiles(spark, dir, "y", lit(0L), lit(15L))
    assert(cx.size * 2 <= nFiles, s"x-range must skip >= half the files: ${cx.size}/$nFiles")
    assert(cy.size * 2 <= nFiles, s"y-range must skip >= half the files: ${cy.size}/$nFiles")
    // and pruned reads stay exact
    val gx = ZoneMap.readRange(spark, dir, "x", lit(0L), lit(15L)).count()
    assert(gx == 16L * 64, s"x in [0,15] over the grid = 1024 rows, got $gx")
    val gy = ZoneMap.readRange(spark, dir, "y", lit(0L), lit(15L)).count()
    assert(gy == 16L * 64)
  }

  test("string stats columns prune lexicographic ranges the same way") {
    val dir = tmp("graft_zonemap_str")
    val df = spark.range(500).select(
      concat(lit("key_"), lpad(col("id").cast("string"), 4, "0")).as("k"), col("id").as("v"))
      .repartitionByRange(8, col("k"))
    ZoneMap.write(df, dir, Seq("k"))
    val nFiles = spark.read.parquet(s"$dir/_zonemap").count()
    val cand = ZoneMap.candidateFiles(spark, dir, "k", lit("key_0100"), lit("key_0149"))
    assert(cand.size < nFiles, "lexicographic range must skip files")
    val got = ZoneMap.readRange(spark, dir, "k", lit("key_0100"), lit("key_0149"))
      .select("v").as[Long].collect().toSet
    assert(got == (100L to 149L).toSet)
  }

  test("manifest derives from parquet footers — no second pass over the data") {
    // the write itself reads the 20k source rows once; a post-write
    // manifest scan would read them AGAIN (≈40k total). Footer stats
    // keep total input reads strictly below that.
    val src = tmp("graft_zonemap_src")
    spark.range(20000).select(col("id").as("k"), (col("id") * 3).as("v"))
      .write.mode("overwrite").parquet(src)
    val df = spark.read.parquet(src).repartition(6, col("k"))
    val dir = tmp("graft_zonemap_io")
    @volatile var records = 0L
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) records += t.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      ZoneMap.write(df, dir, Seq("k"))
      // listener events are async; wait until the counter settles
      var last = -1L; var settle = 0
      while (settle < 3) {
        Thread.sleep(200)
        if (records == last) settle += 1 else { settle = 0; last = records }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(records <= 30000L,
      s"manifest must not re-scan the data: $records input records for a 20k write")
    // and the footer-derived manifest equals the scan-derived truth
    def byName(rows: Array[org.apache.spark.sql.Row]): Map[String, (Long, Long)] =
      rows.map(r => (r.getString(0).split('/').last, (r.getLong(1), r.getLong(2)))).toMap
    val got = byName(spark.read.parquet(s"$dir/_zonemap")
      .select(col("file"), col("min_k"), col("max_k")).collect())
    val want = byName(spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col("k")).as("mn"), max(col("k")).as("mx")).collect())
    assert(got == want, s"footer stats must equal scan stats\n got=$got\nwant=$want")
  }

  test("double stats take the scan path: NaN rows are never falsely skipped") {
    val dir = tmp("graft_zonemap_nan")
    // Parquet chunk statistics EXCLUDE NaN while Spark orders NaN
    // greater than every value: a footer-derived manifest would give
    // this file a finite max and a [lo, NaN] range read would falsely
    // skip it — double columns must fall back to the aggregate scan,
    // whose max() surfaces NaN into the manifest
    val df = Seq((1.0, 1L), (2.0, 2L), (Double.NaN, 3L))
      .toDF("k", "v").coalesce(1)
    ZoneMap.write(df, dir, Seq("k"))
    val mx = spark.read.parquet(s"$dir/_zonemap")
      .select("max_k").as[Double].collect()
    assert(mx.exists(_.isNaN), s"scan-derived max must be NaN, got ${mx.toSeq}")
    val got = ZoneMap.readRange(spark, dir, "k",
        lit(3.0), lit(Double.NaN)).select("v").as[Long].collect().toSet
    assert(got == Set(3L), "the NaN row is found by a [3.0, NaN] range read")
  }

  test("files with NULL bounds are conservatively kept, never falsely skipped") {
    val dir = tmp("graft_zonemap_null")
    // one partition all-NULL keys (NULL min/max), one normal
    val df = Seq[(Option[Long], Long)]((None, 1L), (None, 2L), (Some(10L), 3L), (Some(20L), 4L))
      .toDF("k", "v").repartition(2, col("k"))
    ZoneMap.write(df, dir, Seq("k"))
    val got = ZoneMap.readRange(spark, dir, "k", lit(0L), lit(100L))
      .select("v").as[Long].collect().toSet
    assert(got == Set(3L, 4L), "range filter drops NULL keys but keeps every in-range row")
  }
}
