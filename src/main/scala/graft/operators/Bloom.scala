package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Bloom-filter join pruning (SURVEY §2 E9).
  *
  * A big⋈small join shuffles every big-side row — including the ones
  * whose key the small side doesn't even contain. A Bloom filter of
  * the small side's keys, applied as a MAP-SIDE prefilter on the big
  * side, drops most non-matching rows BEFORE the exchange (or before
  * the probe of a broadcast join): at 100 TB, a selective join's
  * shuffle shrinks by the non-match fraction at the cost of one
  * dim-side pass plus an 8 KB bit array on every executor.
  *
  * This is the engine-owned version of Spark's own runtime bloom
  * filter (`spark.sql.optimizer.runtime.bloomFilter.enabled`, which
  * only fires under join-selectivity statistics): the bits ride as a
  * PLAN CONSTANT (the IVF codebook pattern — collected once at plan
  * build, never shuffled), so the prefilter is codegen'd arithmetic,
  * applies to any join shape, and — because the filter has NO false
  * negatives — never changes the join's result (spec-asserted).
  *
  * Determinism: bit positions are splitmix64 of the key (seeds
  * 0..kHashes-1), identical to the Count-Min cell function, so the
  * filter (and the measured prune rate) replays in any engine.
  */
object Bloom {

  /** Build the bit array (as 64-bit words) of the small side's keys.
    * Driver-sized by contract: `mBits` defaults to 2¹⁶ = 8 KB of
    * bits; the build is one narrow aggregate of (word, or-mask)
    * pairs, so the exchange carries at most mBits/64 rows per
    * partition — never the keys. */
  def buildBits(keys: DataFrame, key: Column, mBits: Int = 1 << 16,
                kHashes: Int = 4): Array[Long] = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
      "Bloom.buildBits: mBits must be a power of two >= 64")
    require(kHashes >= 1 && kHashes <= 16, "Bloom.buildBits: kHashes in [1, 16]")
    val words = new Array[Long](mBits / 64)
    // NULL keys contribute no bits (a NULL never equi-joins, so the
    // prefilter owes it nothing — and a NULL bit position would NPE
    // the driver-side fold below)
    val masks = keys
      .filter(key.isNotNull)
      .select((0 until kHashes).map { r =>
        (shiftrightunsigned(Hashing.hashLong64(key, r.toLong), 1) % mBits).as(s"b$r")
      }: _*)
      .select(explode(array((0 until kHashes).map { r =>
        struct((col(s"b$r") / 64).cast("int").as("w"),
          call_function("shiftleft", lit(1L), (col(s"b$r") % 64).cast("int")).as("m"))
      }: _*)).as("s"))
      .groupBy(col("s.w")).agg(bit_or(col("s.m")).as("m"))
      .collect()
    masks.foreach(row => words(row.getInt(0)) |= row.getLong(1))
    words
  }

  /** Membership test column: true iff all `kHashes` bit positions of
    * `key` are set in `words`. The word array is a plan literal —
    * pure codegen'd arithmetic, no join, no shuffle. False positives
    * possible (rate ≈ (1−e^(−k·n/m))^k); false negatives never. */
  def mightContain(key: Column, words: Array[Long], mBits: Int = 1 << 16,
                   kHashes: Int = 4): Column = {
    val wordsLit = typedlit(words.toSeq)
    (0 until kHashes).map { r =>
      val bit = shiftrightunsigned(Hashing.hashLong64(key, r.toLong), 1) % mBits
      val word = element_at(wordsLit, (bit / 64).cast("int") + 1)
      call_function("shiftrightunsigned", word, (bit % 64).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }

  /** Join with a Bloom prefilter on the probe side: result-identical
    * to `big.join(small, bigKey === smallKey, "inner")`, but big-side
    * rows whose key cannot be in `small` are dropped map-side before
    * any exchange. Builds the filter from `small` at plan-build time
    * (one dim-side job, the codebook pattern). */
  def prunedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String,
                 mBits: Int = 1 << 16, kHashes: Int = 4): DataFrame = {
    val words = buildBits(small, col(smallKey), mBits, kHashes)
    big.filter(mightContain(col(bigKey), words, mBits, kHashes))
      .join(small, col(bigKey) === col(smallKey), "inner")
  }
}
