package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.sql.graftbridge.ColumnBridge.{toColumn, toExpr}

/** Vector math over `array<float>` embedding columns.
  *
  * All arithmetic is promoted to double and accumulated strictly
  * left-to-right, which makes results bit-reproducible across engines
  * and partitionings (a requirement for the DuckDB oracle and for
  * threshold-stable dedup at scale).
  *
  * The hot path ([[cosine]]) is a native codegen'd expression: one
  * fused loop per pair, no per-element boxing — this is what a
  * 2M-pair brute-force scan runs through. [[cosineHof]] is the
  * higher-order-function formulation kept as a cross-check: both
  * produce bit-identical doubles (same operation order).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double, left-to-right (higher-order form; fine for
    * small fan-in like hyperplane bucketing). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via HOFs — reference formulation. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Fused native cosine: xy / (√xx · √yy), all three sums in one
    * loop, same accumulation order as [[cosineHof]]. */
  case class CosineF32(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullIntolerant: Boolean = true
    override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineF32 =
      copy(left = l, right = r)

    override def nullSafeEval(av: Any, bv: Any): Any = {
      val a = av.asInstanceOf[ArrayData]
      val b = bv.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var xy = 0.0; var xx = 0.0; var yy = 0.0
      var i = 0
      while (i < n) {
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        xy += x * y; xx += x * x; yy += y * y
        i += 1
      }
      java.lang.Double.valueOf(xy / (math.sqrt(xx) * math.sqrt(yy)))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val xy = ctx.freshName("xy")
        val xx = ctx.freshName("xx")
        val yy = ctx.freshName("yy")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $xy = 0.0, $xx = 0.0, $yy = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.getFloat($i);
           |  double $y = (double) $b.getFloat($i);
           |  $xy += $x * $y; $xx += $x * $x; $yy += $y * $y;
           |}
           |${ev.value} = $xy / (Math.sqrt($xx) * Math.sqrt($yy));
           |""".stripMargin
      })
  }

  /** Cosine similarity in double precision (native fused loop). */
  def cosine(a: Column, b: Column): Column = toColumn(CosineF32(toExpr(a), toExpr(b)))

  /** [[CosineF32]]'s arithmetic against a plan-constant centroid —
    * identical loop/accumulation order, so scores are bit-equal to the
    * pairwise expression (required for oracle hash-match). */
  def cosineVsConst(a: ArrayData, b: Array[Float]): Double = {
    val n = math.min(a.numElements(), b.length)
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b(i).toDouble
      xy += x * y; xx += x * x; yy += y * y
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  /** Kernel for [[NearestCentroids]] (also called from generated
    * code): ids of the `n` centroids nearest to `v` by (cosine desc,
    * id asc — strict-greater keeps the first/lowest id on ties).
    *
    * Zero-norm vectors: a zero-norm `v` (or centroid) yields NaN
    * cosines, and `NaN > x` is false for every x — so NaN-scored
    * centroids lose every comparison and are picked last, in codebook
    * id order. Deterministic, no special-casing needed; an all-zero
    * `v` degrades to "first n centroid ids". */
  def nearestCids(v: ArrayData, cents: Array[Array[Float]], cids: Array[Long],
                  n: Int): GenericArrayData = {
    val m = cents.length
    val cos = new Array[Double](m)
    var c = 0
    while (c < m) { cos(c) = cosineVsConst(v, cents(c)); c += 1 }
    val used = new Array[Boolean](m)
    val picked = new Array[Long](n)
    var r = 0
    while (r < n) {
      var best = -1
      var i = 0
      while (i < m) {
        if (!used(i) && (best < 0 || cos(i) > cos(best))) best = i
        i += 1
      }
      used(best) = true
      picked(r) = cids(best)
      r += 1
    }
    new GenericArrayData(picked)
  }

  /** Ids of the `n` nearest centroids of a plan-constant codebook —
    * the IVF coarse quantizer as a pure map-side expression. The
    * codebook (an index artifact, built once) ships as a plan constant
    * to every task, so inverted-list assignment of a 100 TB corpus
    * never shuffles an embedding: the only per-row state that moves is
    * the chosen list id. */
  case class NearestCentroids(child: Expression, cents: Array[Array[Float]],
                              cids: Array[Long], n: Int) extends UnaryExpression {
    require(cents.length == cids.length,
      s"codebook mismatch: ${cents.length} centroids vs ${cids.length} ids")
    require(n >= 1 && n <= cents.length,
      s"nprobe/n=$n must be in [1, ${cents.length}] (codebook size)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): NearestCentroids = copy(child = c)

    override def nullSafeEval(v: Any): Any =
      nearestCids(v.asInstanceOf[ArrayData], cents, cids, n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
        val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
        s"${ev.value} = graft.functions.VectorFunctions.nearestCids($c, $centsRef, $cidsRef, $n);"
      })
  }

  def nearestCentroids(v: Column, cents: Array[Array[Float]], cids: Array[Long], n: Int): Column =
    toColumn(NearestCentroids(toExpr(v), cents, cids, n))
}
