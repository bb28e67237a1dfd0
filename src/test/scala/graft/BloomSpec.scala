package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Bloom

/** Bloom join pruning (SURVEY §2 E9): no false negatives (the join
  * result is untouched), a measured prune rate on the probe side, and
  * determinism of the bit array. */
class BloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("membership: every inserted key passes; absent keys mostly don't") {
    val keys = spark.range(1000).select((col("id") * 3).as("k"))
    val words = Bloom.buildBits(keys, col("k"))
    val inserted = keys.filter(Bloom.mightContain(col("k"), words)).count()
    assert(inserted == 1000, "false negative: an inserted key failed the filter")
    // probe 10k keys disjoint from the inserted set (ids 3M..3M+10k)
    val absent = spark.range(10000).select((col("id") + 3000000).as("k"))
    val fp = absent.filter(Bloom.mightContain(col("k"), words)).count()
    // theory: (1 - e^(-4*1000/65536))^4 ≈ 1.2e-5 — allow 100× slack
    assert(fp <= 10, s"false-positive rate implausibly high: $fp / 10000")
  }

  test("prunedJoin is result-identical to the plain join") {
    val big = spark.range(20000)
      .select(col("id").as("o_id"), (col("id") % 997).as("k"))
    val small = spark.range(50).select((col("id") * 7).as("sk"), col("id").as("payload"))
    val pruned = Bloom.prunedJoin(big, small, "k", "sk")
    val plain = big.join(small, col("k") === col("sk"), "inner")
    assert(pruned.exceptAll(plain).count() == 0 && plain.exceptAll(pruned).count() == 0)
    assert(pruned.count() > 0, "test data must actually join")
  }

  test("NULL keys: ignored by the build, never pass the membership test") {
    val keys = spark.range(100)
      .select(when(col("id") % 2 === 0, col("id")).as("k")) // half NULL
    val words = Bloom.buildBits(keys, col("k"))
    val evens = keys.filter(col("k").isNotNull)
    assert(evens.filter(Bloom.mightContain(col("k"), words)).count() == 50)
    // a NULL probe key yields NULL (not true) — inner-join semantics
    val nullPass = spark.range(1).select(lit(null).cast("long").as("k"))
      .filter(Bloom.mightContain(col("k"), words)).count()
    assert(nullPass == 0)
  }

  test("bit array is deterministic and partition-order invariant") {
    val keys = spark.range(5000).select((col("id") % 1234).as("k"))
    val a = Bloom.buildBits(keys.repartition(1), col("k"))
    val b = Bloom.buildBits(keys.repartition(16), col("k"))
    assert(a.toSeq == b.toSeq)
  }

  test("prefilter drops non-matching probe rows before the join") {
    val big = spark.range(100000).select(col("id").as("k"))
    val small = spark.range(100).select((col("id") * 1000).as("sk"))
    val words = Bloom.buildBits(small, col("sk"))
    val kept = big.filter(Bloom.mightContain(col("k"), words)).count()
    // 100 true matches; false positives ≈ 1.2e-5 · 100k ≈ 1
    assert(kept < 1000, s"prefilter should drop ~99.9% of probe rows, kept $kept")
    assert(kept >= 100, "prefilter must keep every true match")
  }
}
