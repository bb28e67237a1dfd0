package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable sketch aggregates (SURVEY §2 D29).
  *
  * The reference counts distincts the exact way (an aggregation per
  * query); at 100 TB an exact per-group COUNT(DISTINCT x) either
  * shuffles every distinct value or Expand-doubles the scan. The KMV
  * (k-minimum-values) sketch bounds the per-group state to k 8-byte
  * hashes REGARDLESS of cardinality: keep the k smallest distinct
  * 63-bit hashes of the values; the k-th smallest estimates the
  * density, so `(k-1) * 2^63 / kth` estimates the cardinality
  * (Bar-Yossef et al. 2002, the classic "distinct elements in a
  * stream" bound). Union of sketches = k smallest of the union — the
  * aggregate is associative/commutative, so Spark runs it as a
  * partial ObjectHashAggregate before the one group-key exchange:
  * each partition ships at most k longs per group, never the values.
  *
  * Determinism: the hash is [[Hashing.hashLong]] (splitmix64), masked
  * to [0, 2^63) so signed order == unsigned order; no RNG, no
  * timestamp — the sketch is bit-replayable in any engine with the
  * same hash (the DuckDB oracle replays it via `DuckSql.hashLongCtes`
  * + `% 2^63` + a row_number cut).
  */
object Sketches {

  /** Typed aggregate: k smallest DISTINCT nonnegative longs of the
    * child column, ascending. Buffer is a bounded TreeSet (k ≤ ~4096
    * expected; each update is O(log k) with an early-out against the
    * current k-th). Emits `array<long>` of size min(k, observed
    * distinct) — fewer than k values means the sketch IS the exact
    * distinct set. */
  case class KMinValues(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

    require(k >= 2, "KMinValues needs k >= 2 (the estimator uses the k-th minimum)")

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    override def update(
        buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long] & Long.MaxValue
        // early-out: full sketch and h not smaller than the current max
        if (buf.size < k || h < buf.last()) {
          buf.add(h)
          if (buf.size > k) buf.pollLast()
        }
      }
      buf
    }

    override def merge(
        b1: java.util.TreeSet[java.lang.Long],
        b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = b2.iterator()
      while (it.hasNext) {
        val h = it.next()
        if (b1.size < k || h < b1.last()) {
          b1.add(h)
          if (b1.size > k) b1.pollLast()
        }
      }
      b1
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val arr = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      new GenericArrayData(arr)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * buf.size)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KMinValues =
      copy(child = newChild)
    override def prettyName: String = "kmin_values"
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge.{toColumn, toExpr}

  /** Aggregate Column: ascending array of the k smallest distinct
    * 63-bit-masked hashes. Feed it an already-hashed long column
    * (e.g. [[Hashing.hashLong64]]). */
  def kMinValues(hashed: Column, k: Int): Column =
    toColumn(KMinValues(toExpr(hashed), k).toAggregateExpression())
}
