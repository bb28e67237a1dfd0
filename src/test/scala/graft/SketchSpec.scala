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
    val p = Sketch.distinctKmv(df, col("g"), col("v"), k = 256)
      .queryExecution.explainString(FormattedMode)
    assert(raw"\(\d+\) ObjectHashAggregate\b".r.findAllIn(p).size == 2,
      s"expect partial (map-side) + final ObjectHashAggregate:\n$p")
    assert(p.contains("partial_kmin_values"),
      s"the map-side combine must run the sketch, not ship rows:\n$p")
    assert(raw"\(\d+\) Exchange\b".r.findAllIn(p).size == 1,
      s"the sketch must pay exactly the one group-key exchange:\n$p")
    assert(!p.contains("Expand"),
      s"no Expand — that is the exact count-distinct plan the sketch replaces:\n$p")
  }
}
