package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, Sketches}

/** Sketch-based approximate aggregates (SURVEY §2 D29).
  *
  * At 100 TB an exact per-group COUNT(DISTINCT v) is one of the two
  * classic scale-killers (the other is the global sort): Spark plans
  * it either as an Expand (doubling the scanned rows per distinct
  * aggregate) or as two exchanges carrying every distinct value. The
  * KMV sketch ([[Sketches.KMinValues]]) replaces that with bounded
  * state — k longs per group per partition, partial-aggregated
  * map-side, one group-key exchange of ≤ k·groups longs total.
  *
  * Error: relative error of the (k-1)·2⁶³/kth estimator is ~1/√(k-2)
  * (≈6% at k=256). Groups with fewer than k distinct values are
  * EXACT — the sketch degrades to the full distinct hash set.
  *
  * Everything is deterministic (splitmix64 of the value, no RNG), so
  * the whole sketch — kept hashes, estimate, and its error vs the
  * exact count — replays bit-identically in the DuckDB oracle.
  */
object Sketch {

  /** 2⁶³ as a double (exactly representable: a power of two). */
  private val TwoPow63 = math.pow(2.0, 63)

  /** Per-stratum approximate distinct count of `value`.
    *
    * Output: (stratum, n_kept, kth_min, est_distinct) — `kth_min` is
    * the largest kept hash (the k-th minimum when the sketch is
    * full), `est_distinct` = (k-1)·2⁶³/kth when full, else the exact
    * kept count. One IEEE division past exact integers, so the
    * estimate itself is engine-portable. */
  /** The KMV estimate off a kept-hash array column: exact kept count
    * below k, else (k−1)·2⁶³/kth — one IEEE division past exact
    * integers ((k-1)·2⁶³ is exact in double: ≤ 10 significand bits
    * shifted by 63). */
  def kmvEstimate(kmv: Column, k: Int): Column = {
    val scale = (k - 1).toDouble * TwoPow63
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit(scale) / element_at(kmv, size(kmv)).cast("double"))
  }

  def distinctKmv(df: DataFrame, stratum: Column, value: Column,
                  k: Int, seed: Long = 7L): DataFrame =
    df.groupBy(stratum.as("stratum"))
      .agg(Sketches.kMinValues(Hashing.hashLong64(value, seed), k).as("kmv"))
      .select(
        col("stratum"),
        size(col("kmv")).cast("long").as("n_kept"),
        element_at(col("kmv"), size(col("kmv"))).as("kth_min"),
        kmvEstimate(col("kmv"), k).as("est_distinct"))

  /** [[distinctKmv]] plus the exact distinct count and the measured
    * relative error — the "approximation cost is a query result, not
    * a claim" companion (same pattern as the ANN recall gates). The
    * exact branch is the expensive plan the sketch replaces; it lives
    * only in this validation query. */
  def distinctKmvChecked(df: DataFrame, stratum: Column, value: Column,
                         k: Int, seed: Long = 7L): DataFrame = {
    val sk = distinctKmv(df, stratum, value, k, seed)
    val exact = df.groupBy(stratum.as("stratum"))
      .agg(count_distinct(value).as("exact_distinct"))
    sk.join(exact, "stratum")
      .withColumn("rel_err",
        abs((col("est_distinct") - col("exact_distinct").cast("double")) /
          col("exact_distinct").cast("double")))
  }
}
