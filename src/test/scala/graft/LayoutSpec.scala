package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout (SURVEY §2 E10): the interleave itself, and the
  * pruning evidence — per-file min/max stats are tight in BOTH
  * dimensions under the z layout, so a box predicate overlaps few
  * files; a 1-D layout leaves the second dimension unprunable. */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue interleaves bits (x even positions, y odd)") {
    val r = spark.range(1)
      .select(
        ZOrder.zValue(lit(3L), lit(2L), 4).as("a"),   // x=0b11, y=0b10
        ZOrder.zValue(lit(0L), lit(15L), 4).as("b"),  // only odd bits
        ZOrder.zValue(lit(15L), lit(0L), 4).as("c"))  // only even bits
      .collect()(0)
    assert(r.getLong(0) == 13L) // 0b1101
    assert(r.getLong(1) == 0xAAL) // 0b10101010
    assert(r.getLong(2) == 0x55L) // 0b01010101
  }

  test("z layout: box predicate overlaps few files; 1-D layout overlaps all") {
    // 64×64 grid, one row per cell, 16 files per layout
    val grid = spark.range(64L * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).as("y"))
    val zdir = "/tmp/graft_layout_z"
    val xdir = "/tmp/graft_layout_x"
    ZOrder.writeZOrdered(grid, col("x"), col("y"), zdir, nFiles = 16, bits = 6)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xdir)
    // files whose [min,max] y-extent overlaps the box y < 8 — the
    // stats a parquet reader prunes row groups with
    def overlapping(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("y")).as("lo"), max(col("y")).as("hi"))
        .filter(col("lo") < 8).count()
    val zFiles = overlapping(zdir)
    val xFiles = overlapping(xdir)
    assert(xFiles == 16L,
      s"x-sorted layout: every file spans the full y range, got $xFiles")
    assert(zFiles <= 4L,
      s"z layout: y < 8 is the bottom z-stripe — at most a quarter of the files, got $zFiles")
    // and the layouts hold identical data
    assert(spark.read.parquet(zdir).exceptAll(spark.read.parquet(xdir)).count() == 0)
  }
}
