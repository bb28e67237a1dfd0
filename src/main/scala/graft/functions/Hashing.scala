package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document-hashing primitives as native Catalyst expressions
  * (SURVEY §2 E3): MinHash signatures, SimHash, and a 64-bit content
  * fingerprint. One pass over the input per row, no UDF boxing; the
  * hash core is a public-domain construction (FNV-1a over bytes mixed
  * with splitmix64 finalizers), so results are stable across JVMs and
  * documented for reimplementation.
  *
  * These are the operators behind the reference-beyond dedup surface:
  * MinHash→LSH banding for near-dup candidate generation, SimHash for
  * hamming-distance dedup, fingerprints for exact/rolling identity.
  */
object Hashing {

  /** FNV-1a 64-bit over UTF-8 bytes, then splitmix64 finalizer with a
    * seed mixed in — cheap, well-distributed, public-domain. */
  @inline def hash64(bytes: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // splitmix64 finalizer
    h += 0x9e3779b97f4a7c15L
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** MinHash signature of a string array: `numHashes` permutations via
    * the standard h1 + i·h2 double-hashing scheme (one byte pass per
    * element). Empty/null arrays → signature of Long.MaxValue. */
  case class MinHashSig(child: Expression, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val sig = Array.fill(numHashes)(Long.MaxValue)
      var i = 0
      while (i < arr.numElements()) {
        val bytes = arr.getUTF8String(i).getBytes
        val h1 = hash64(bytes, 0L)
        val h2 = hash64(bytes, 1L)
        var j = 0
        while (j < numHashes) {
          val hv = h1 + j * h2
          if (hv < sig(j)) sig(j) = hv
          j += 1
        }
        i += 1
      }
      new GenericArrayData(sig)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val sig = ctx.freshName("sig")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val bytes = ctx.freshName("bytes")
        val h1 = ctx.freshName("h1")
        val h2 = ctx.freshName("h2")
        val hv = ctx.freshName("hv")
        val hcls = "graft.functions.Hashing"
        s"""
           |long[] $sig = new long[$numHashes];
           |java.util.Arrays.fill($sig, Long.MAX_VALUE);
           |for (int $i = 0; $i < $c.numElements(); $i++) {
           |  byte[] $bytes = $c.getUTF8String($i).getBytes();
           |  long $h1 = $hcls.hash64($bytes, 0L);
           |  long $h2 = $hcls.hash64($bytes, 1L);
           |  for (int $j = 0; $j < $numHashes; $j++) {
           |    long $hv = $h1 + $j * $h2;
           |    if ($hv < $sig[$j]) $sig[$j] = $hv;
           |  }
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
           |""".stripMargin
      })
  }

  /** LSH band hashes over a MinHash signature: `bands` hashes, each a
    * 31-fold over `rowsPerBand` consecutive signature entries. Native
    * expression so the wrap-around long arithmetic is plain Java —
    * Column-level `*`/`+` would throw under ANSI mode (Spark 4
    * default) on intentional overflow. */
  case class BandHashes(child: Expression, bands: Int, rowsPerBand: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): BandHashes = copy(child = c)

    override def nullSafeEval(v: Any): Any = {
      val sig = v.asInstanceOf[ArrayData]
      val out = new Array[Long](bands)
      var b = 0
      while (b < bands) {
        var acc = 17L
        var r = 0
        while (r < rowsPerBand) {
          acc = acc * 31 + sig.getLong(b * rowsPerBand + r)
          r += 1
        }
        out(b) = acc
        b += 1
      }
      new GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val out = ctx.freshName("out")
        val b = ctx.freshName("b")
        val r = ctx.freshName("r")
        val acc = ctx.freshName("acc")
        s"""
           |long[] $out = new long[$bands];
           |for (int $b = 0; $b < $bands; $b++) {
           |  long $acc = 17L;
           |  for (int $r = 0; $r < $rowsPerBand; $r++) {
           |    $acc = $acc * 31L + $c.getLong($b * $rowsPerBand + $r);
           |  }
           |  $out[$b] = $acc;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      })
  }

  /** 64-bit SimHash of a token array: per-token hash votes on each bit,
    * weighted by multiplicity. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)

    override def nullSafeEval(v: Any): Any = {
      val arr = v.asInstanceOf[ArrayData]
      val votes = new Array[Int](64)
      var i = 0
      while (i < arr.numElements()) {
        val h = hash64(arr.getUTF8String(i).getBytes, 2L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) {
        if (votes(j) > 0) out |= (1L << j)
        j += 1
      }
      java.lang.Long.valueOf(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val votes = ctx.freshName("votes")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val out = ctx.freshName("out")
        val hcls = "graft.functions.Hashing"
        s"""
           |int[] $votes = new int[64];
           |for (int $i = 0; $i < $c.numElements(); $i++) {
           |  long $h = $hcls.hash64($c.getUTF8String($i).getBytes(), 2L);
           |  for (int $j = 0; $j < 64; $j++) {
           |    if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
           |  }
           |}
           |long $out = 0L;
           |for (int $j = 0; $j < 64; $j++) if ($votes[$j] > 0) $out |= (1L << $j);
           |${ev.value} = $out;
           |""".stripMargin
      })
  }

  /** 64-bit content fingerprint (FNV-1a + finalizer) of a string. */
  case class Fingerprint64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): Fingerprint64 = copy(child = c)

    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(hash64(v.asInstanceOf[UTF8String].getBytes, 3L))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val hcls = "graft.functions.Hashing"
        s"${ev.value} = $hcls.hash64($c.getBytes(), 3L);"
      })
  }

  // Column-API wrappers (Spark 4: Column ↔ Expression via the bridge)
  import org.apache.spark.sql.graftbridge.ColumnBridge.{toColumn, toExpr}
  def minhash(shingles: Column, numHashes: Int = 128): Column =
    toColumn(MinHashSig(toExpr(shingles), numHashes))
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    toColumn(BandHashes(toExpr(sig), bands, rowsPerBand))
  def simhash(tokens: Column): Column = toColumn(SimHash64(toExpr(tokens)))
  def fingerprint(text: Column): Column = toColumn(Fingerprint64(toExpr(text)))
}
