package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Hashing._
import graft.functions.TextFunctions.{RepStats, TokenStats}
import graft.functions.VectorFunctions.CosineF32

/** SQL surface for graft's native expressions.
  *
  * Register with `SparkSession.builder().withExtensions(new
  * GraftExtensions)` (or `spark.sql.extensions=graft.plans.
  * GraftExtensions`) and the engine's codegen'd primitives become
  * plain SQL functions:
  *
  * {{{
  *   SELECT graft_fingerprint(text)             FROM docs
  *   SELECT graft_minhash(graft_shingles3(split(text,' '))) FROM docs
  *   SELECT graft_cosine(a.embedding, b.embedding)          FROM ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Parameter args (hash counts, band shape) must be literals: the
    * expression is shaped at plan time. A column arg used to NPE inside
    * the builder (`eval()` on an unbound attribute); raise a proper
    * analysis-time error instead. */
  private def intLit(e: Expression, fn: String, param: String): Int = {
    def fail(): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$fn`", "paramName" -> s"`$param`", "paramType" -> "\"INT\""))
    if (!e.foldable) fail()
    // integral literals only: a fractional value (1.5) must raise, not
    // silently truncate to 1
    e.eval() match {
      case n: java.lang.Byte => n.intValue()
      case n: java.lang.Short => n.intValue()
      case n: java.lang.Integer => n.intValue()
      case n: java.lang.Long if n.longValue() == n.intValue().toLong => n.intValue()
      case _ => fail()
    }
  }

  /** Like [[intLit]] but for 64-bit parameters (seeds): accepts any
    * integral literal without narrowing, and reports BIGINT in the
    * analysis error. */
  private def longLit(e: Expression, fn: String, param: String): Long = {
    def fail(): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$fn`", "paramName" -> s"`$param`", "paramType" -> "\"BIGINT\""))
    if (!e.foldable) fail()
    // only integral literal types — java.lang.Number.longValue() on a
    // Double/Decimal would silently truncate graft_hashlong(x, 1.5)'s
    // seed to 1 instead of raising the advertised BIGINT error
    e.eval() match {
      case n: java.lang.Byte => n.longValue()
      case n: java.lang.Short => n.longValue()
      case n: java.lang.Integer => n.longValue()
      case n: java.lang.Long => n.longValue()
      case _ => fail()
    }
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_fingerprint"),
      info("graft_fingerprint", "graft_fingerprint(str) - 64-bit content fingerprint"),
      (exprs: Seq[Expression]) => Fingerprint64(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(array<string>) - 64-bit SimHash"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_shingles3"),
      info("graft_shingles3", "graft_shingles3(array<string>) - sorted hashed word 3-grams"),
      (exprs: Seq[Expression]) => HashedShingles3(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_shinglesn"),
      info("graft_shinglesn", "graft_shinglesn(array<string>, n) - sorted hashed word n-grams"),
      (exprs: Seq[Expression]) => HashedShinglesN(exprs.head,
        intLit(exprs(1), "graft_shinglesn", "n"))))
    e.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash", "graft_minhash(arr[, n]) - MinHash signature (default 128 perms)"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head,
        if (exprs.length > 1) intLit(exprs(1), "graft_minhash", "numHashes") else 128)))
    e.injectFunction((FunctionIdentifier("graft_bandhash"),
      info("graft_bandhash", "graft_bandhash(sig, bands, rowsPerBand) - LSH band hashes"),
      (exprs: Seq[Expression]) => BandHashes(exprs.head,
        intLit(exprs(1), "graft_bandhash", "bands"),
        intLit(exprs(2), "graft_bandhash", "rowsPerBand"))))
    e.injectFunction((FunctionIdentifier("graft_sorted_intersect"),
      info("graft_sorted_intersect", "graft_sorted_intersect(a, b) - |a ∩ b| of sorted long arrays"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_cosine"),
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of float vectors"),
      (exprs: Seq[Expression]) => CosineF32(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("graft_token_stats"),
      info("graft_token_stats", "graft_token_stats(array<string>) - one-pass token statistics struct"),
      (exprs: Seq[Expression]) => TokenStats(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_rep_stats"),
      info("graft_rep_stats", "graft_rep_stats(array<string>) - one-pass repetition statistics struct"),
      (exprs: Seq[Expression]) => RepStats(exprs.head)))
    e.injectFunction((FunctionIdentifier("graft_hashlong"),
      info("graft_hashlong", "graft_hashlong(v, seed) - splitmix64 of a long with a literal seed"),
      (exprs: Seq[Expression]) => HashLong64(exprs.head,
        longLit(exprs(1), "graft_hashlong", "seed"))))
    e.injectFunction((FunctionIdentifier("graft_bigrams"),
      info("graft_bigrams", "graft_bigrams(array<string>) - distinct adjacent bigrams"),
      (exprs: Seq[Expression]) => graft.functions.TextFunctions.DistinctBigrams(exprs.head)))
    // sketch AGGREGATES: the analyzer wraps a bare AggregateFunction
    // returned from a registered builder in its AggregateExpression,
    // so `SELECT g, graft_kmv(graft_hashlong(v, 7), 256) ... GROUP BY g`
    // runs the same partial-aggregated sketch as the Column API
    e.injectFunction((FunctionIdentifier("graft_kmv"),
      info("graft_kmv", "graft_kmv(hashed, k) - k smallest distinct 63-bit hashes (KMV sketch)"),
      (exprs: Seq[Expression]) => graft.functions.Sketches.KMinValues(exprs.head,
        intLit(exprs(1), "graft_kmv", "k"))))
    e.injectFunction((FunctionIdentifier("graft_cms"),
      info("graft_cms", "graft_cms(hashed, depth, width) - Count-Min counter matrix"),
      (exprs: Seq[Expression]) => graft.functions.Sketches.CountMinSketch(exprs.head,
        intLit(exprs(1), "graft_cms", "depth"),
        intLit(exprs(2), "graft_cms", "width"))))
    // composed scalar: the z-value is a tree of built-in shift/and/or
    // expressions (the same shape ZOrder.zValue builds via Columns)
    e.injectFunction((FunctionIdentifier("graft_zvalue"),
      info("graft_zvalue", "graft_zvalue(x, y[, bits]) - Morton bit-interleave of two longs"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{
          BitwiseAnd, BitwiseOr, Literal, ShiftLeft, ShiftRightUnsigned}
        val bits = if (exprs.length > 2) intLit(exprs(2), "graft_zvalue", "bits") else 16
        require(bits >= 1 && bits <= 31, s"graft_zvalue: bits in [1, 31], got $bits")
        (0 until bits).map { i =>
          val xb = ShiftLeft(BitwiseAnd(
            ShiftRightUnsigned(exprs.head, Literal(i)), Literal(1L)), Literal(2 * i))
          val yb = ShiftLeft(BitwiseAnd(
            ShiftRightUnsigned(exprs(1), Literal(i)), Literal(1L)), Literal(2 * i + 1))
          BitwiseOr(xb, yb): Expression
        }.reduce(BitwiseOr(_, _))
      }))
  }
}
