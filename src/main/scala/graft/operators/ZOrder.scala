package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout (SURVEY §2 E10).
  *
  * Parquet scan pruning is driven by per-file/row-group min/max
  * column statistics; a table laid out by ONE column prunes on that
  * column only — every file spans the full range of every other
  * column, so a predicate on a second dimension reads everything.
  * Interleaving the bits of two columns (the Morton curve) makes
  * file-contiguous z-ranges map to compact rectangles in (x, y)
  * space: each file's min/max is tight in BOTH dimensions, and a
  * selective predicate on EITHER prunes files (the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`). LayoutSpec measures it: the
  * same box predicate overlaps ~√F of F z-ordered files vs all F of
  * a 1-D layout.
  *
  * The z-value is pure literal-shift integer arithmetic — codegen'd,
  * map-only, engine-portable (the DuckDB oracle replays it with
  * `//`/`%` arithmetic). The write pays ONE range exchange to
  * cluster by z — the deliberate, amortized exception to the
  * "never RangePartitioning" shuffle rule (`shard_assign` D27):
  * layout is written once, pruned forever.
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of `x` (even output
    * positions) and `y` (odd positions). Inputs must be nonnegative;
    * values ≥ 2^bits fold into the top slice (callers normalize —
    * range-rank or modulo — first). */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "ZOrder.zValue: bits in [1, 31]")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` clustered by z(x, y) into `nFiles` files at `path`.
    * Range-partition + within-partition sort by the z key, so each
    * file covers one compact z-interval (= a tight (x, y) rectangle
    * for the stats pruner). */
  def writeZOrdered(df: DataFrame, x: Column, y: Column, path: String,
                    nFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zValue(x, y, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
