package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

import graft.operators.Sketch

/** KMV distinct sketch (SURVEY §2 D29): exactness below k, accuracy
  * above it, partition-order invariance (the merge path), and the
  * plan shape that makes it the 100 TB count-distinct. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("groups with fewer than k distinct values are exact (rel_err 0)") {
    val df = spark.range(1000)
      .select((col("id") % 4).cast("string").as("g"), (col("id") % 100).as("v"))
    val out = Sketch.distinctKmvChecked(df, col("g"), col("v"), k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    assert(out.length == 4)
    out.foreach { case (g, nKept, est, exact) =>
      assert(exact == 25, s"group $g")
      assert(nKept == 25 && est == 25.0, s"group $g: sketch below k must be exact")
    }
  }

  test("estimator lands within ~4/sqrt(k) of the exact count at 20k distinct") {
    val df = spark.range(20000).select(lit("all").as("g"), col("id").as("v"))
    val r = Sketch.distinctKmvChecked(df, col("g"), col("v"), k = 256).collect()
    assert(r.length == 1)
    val relErr = r(0).getAs[Double]("rel_err")
    assert(relErr < 4.0 / math.sqrt(256.0 - 2), s"rel_err $relErr")
  }

  test("sketch is partition-order invariant (merge == single partition)") {
    val base = spark.range(50000)
      .select((col("id") % 3).cast("string").as("g"), (col("id") % 9001).as("v"))
    val one = Sketch.distinctKmv(base.repartition(1), col("g"), col("v"), k = 128)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    val many = Sketch.distinctKmv(base.repartition(16), col("g"), col("v"), k = 128)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    assert(one.toSeq == many.toSeq)
  }

  test("plan: partial+final object-hash aggregate, one exchange, no Expand") {
    val df = spark.range(100000)
      .select((col("id") % 7).cast("string").as("g"), col("id").as("v"))
    val p = TestSpark.fullPlan(Sketch.distinctKmv(df, col("g"), col("v"), k = 256))
    assert(raw"\(\d+\) ObjectHashAggregate\b".r.findAllIn(p).size == 2,
      s"expect partial (map-side) + final ObjectHashAggregate:\n$p")
    assert(p.contains("partial_kmin_values"),
      s"the map-side combine must run the sketch, not ship rows:\n$p")
    assert(raw"\(\d+\) Exchange\b".r.findAllIn(p).size == 1,
      s"the sketch must pay exactly the one group-key exchange:\n$p")
    assert(!p.contains("Expand"),
      s"no Expand — that is the exact count-distinct plan the sketch replaces:\n$p")
  }

  // ---- Count-Min (SURVEY §2 D31) ----

  import graft.functions.{Hashing, Sketches}

  test("count-min: never underestimates, exact when width avoids collisions") {
    // 10 items with known counts 1..10, width 1024 >> 10 items: with
    // 4 independent rows the chance of a colliding min-cell is nil —
    // every estimate must be exact; with width 4 collisions are
    // guaranteed — estimates must only ever OVERcount
    val df = spark.range(55) // item i repeated i+1 times, i in 0..9
      .select(floor((sqrt(col("id") * 8 + 1) - 1) / 2).as("item"))
    val exact = df.groupBy(col("item")).agg(count(lit(1)).as("n"))
    def estimates(width: Int) = {
      val sk = df.agg(Sketches.countMin(col("item"), 4, width).as("cms"))
      exact.crossJoin(broadcast(sk))
        .withColumn("est", Sketch.cmsEstimate(col("cms"), col("item"), 4, width))
        .collect().map(r => (r.getAs[Long]("n"), r.getAs[Long]("est")))
    }
    estimates(1024).foreach { case (n, est) => assert(est == n, s"wide: $est != $n") }
    estimates(4).foreach { case (n, est) => assert(est >= n, s"narrow: $est < $n") }
  }

  test("count-min: partition-order invariant (elementwise-sum merge)") {
    val df = spark.range(30000).select((col("id") % 517).as("item"))
    def matrix(parts: Int) =
      df.repartition(parts).agg(Sketches.countMin(col("item"), 4, 128).as("cms"))
        .collect()(0).getSeq[Long](0)
    assert(matrix(1) == matrix(16))
  }

  test("heavy hitters: every sampled item with df >= minCount is kept, est >= df") {
    // 40 docs sharing one heavy bigram; planted rare bigrams besides
    val docs = spark.range(40)
      .select(col("id").as("doc_id"),
        concat(lit("alpha beta gamma rare"), col("id").cast("string"), lit(" tail")).as("text"))
    val out = Sketch.heavyHittersCms(docs, depth = 4, width = 256,
        minCount = 10L, sampleMod = 2, seed = 11L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the two heavy bigrams (alpha_beta, beta_gamma) have df = 40;
    // every candidate the sample surfaced with df >= 10 must be kept
    assert(out.length == 2, s"expect the 2 heavy bigrams, got ${out.toSeq}")
    out.foreach { case (_, est, df) =>
      assert(df == 40L && est >= df, s"est $est vs df $df")
    }
  }

  test("count-min plan: single partial-aggregated matrix, no vocabulary shuffle") {
    val docs = spark.range(100)
      .select(col("id").as("doc_id"), lit("a b c d e").as("text"))
    val items = docs.select(col("doc_id"),
      explode(Hashing.hashedShinglesNCol(split(col("text"), " "), 2)).as("bg"))
    val p = TestSpark.fullPlan(items.agg(Sketches.countMin(col("bg"), 4, 512).as("cms")))
    assert(p.contains("partial_count_min_sketch"),
      s"matrix must fold map-side before the exchange:\n$p")
    assert(raw"\(\d+\) Exchange\b".r.findAllIn(p).size == 1,
      s"one single-partition exchange of the matrices only:\n$p")
  }

  test("quantileSketch: sample-exact quantiles match a driver-side reference") {
    val n = 5000
    val df = spark.range(n).select(col("id").as("k"),
      ((col("id") * 37 + 11) % 997).as("v"))
    val got = Sketch.quantileSketch(df, col("k"), col("v"), k = 400)
      .as[(Double, Long)].collect().toMap
    // driver reference: same bottom-k-by-hash sample, same index rule
    val rows = (0L until n).map(i => (i, (i * 37 + 11) % 997))
    val sample = rows.sortBy { case (k, _) =>
      (graft.functions.Hashing.hashLong(k, 77L), k) }.take(400)
    val byVal = sample.sortBy { case (k, v) => (v, k) }.map(_._2)
    val want = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0).map(q =>
      q -> byVal(math.floor(q * (byVal.size - 1)).toInt)).toMap
    assert(got == want)
  }

  test("quantileSketch: partition-order invariant and sub-k tables are whole-table exact") {
    val df = spark.range(50).select(col("id").as("k"), (col("id") * 3).as("v"))
    val a = Sketch.quantileSketch(df, col("k"), col("v"), k = 1000)
      .as[(Double, Long)].collect().toSet
    val b = Sketch.quantileSketch(df.repartition(16), col("k"), col("v"), k = 1000)
      .as[(Double, Long)].collect().toSet
    assert(a == b)
    // n=50 < k: the sample IS the table, so quantiles are exact
    assert(a.contains((0.0, 0L)) && a.contains((1.0, 147L)) && a.contains((0.5, 72L)))
  }

  test("groupQuantileSketch: per-group quantiles equal the global sketch run per stratum") {
    val n = 3000
    val df = spark.range(n).select(col("id").as("k"),
      (col("id") % 3).cast("string").as("g"),
      ((col("id") * 37 + 11) % 997).as("v"))
    val got = Sketch.groupQuantileSketch(df, col("g"), col("k"), col("v"), k = 100)
      .as[(String, Double, Long)].collect().toSet
    // reference: quantileSketch on each stratum's slice independently
    val want = (0 until 3).flatMap { g =>
      Sketch.quantileSketch(df.filter(col("g") === g.toString), col("k"), col("v"), k = 100)
        .as[(Double, Long)].collect().map { case (q, v) => (g.toString, q, v) }
    }.toSet
    assert(got == want)
    // partition-order invariance, the determinism contract
    val re = Sketch.groupQuantileSketch(
      df.repartition(16), col("g"), col("k"), col("v"), k = 100)
      .as[(String, Double, Long)].collect().toSet
    assert(re == got)
  }

  test("groupQuantileSketch plan: one group exchange, bottom-k capped before it") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val p = TestSpark.fullPlan(Sketch.groupQuantileSketch(docs, col("lang"), col("doc_id"), col("n_chars")))
    assert(raw"\(\d+\) Exchange\b".r.findAllIn(p).size == 1,
      s"all three windows must share the single group exchange:\n$p")
    assert(raw"WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"per-group bottom-k needs partial (pre-shuffle) + final WindowGroupLimit:\n$p")
  }
}
