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

  /** Count-Min sketch aggregate (Cormode & Muthukrishnan 2005): a
    * depth×width matrix of counters; each input value increments one
    * counter per row (row r's cell = splitmix64(v, seed=r) mapped to
    * [0, width)), and a point query reads the MINIMUM of its depth
    * cells — an estimate that can only OVERCOUNT (collisions add,
    * never subtract), with error ≤ 2N/width at probability 1−2^−depth.
    *
    * Why a 100 TB engine needs it: exact per-item frequencies of an
    * unbounded vocabulary shuffle the vocabulary; the sketch is a
    * FIXED depth·width·8 bytes regardless of item count, merges by
    * elementwise addition (associative/commutative → Spark partial-
    * aggregates it map-side, the exchange carries one matrix per
    * partition), and the same matrix answers any later point query.
    *
    * Determinism: counters are exact integers and the cell function is
    * splitmix64 — the whole matrix replays bit-identically in DuckDB.
    */
  case class CountMinSketch(
      child: Expression,
      depth: Int,
      width: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

    require(depth >= 1 && depth <= 16, "CountMinSketch: depth in [1, 16]")
    require(width >= 2, "CountMinSketch: width >= 2")

    override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val x = v.asInstanceOf[Long]
        var r = 0
        while (r < depth) {
          val cell = ((Hashing.hashLong(x, r.toLong) >>> 1) % width).toInt
          buf(r * width + cell) += 1L
          r += 1
        }
      }
      buf
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 * buf.length)
      var i = 0
      while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val buf = new Array[Long](depth * width)
      var i = 0
      while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
      buf
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): CountMinSketch =
      copy(child = newChild)
    override def prettyName: String = "count_min_sketch"
  }

  /** Deterministic bottom-k-by-hash SAMPLE aggregate carrying a value
    * payload — the mergeable form of
    * [[graft.operators.Sketch.quantileSketch]]'s sample, so the same
    * hash-stable quantile profile runs INSIDE a streaming state store
    * (per-window length/quality deciles over an unbounded stream with
    * k·16 B of state per window, forever).
    *
    * Semantics: keep the k entries smallest by `(hash, value)` — hash
    * is the signed splitmix64 of the row key (same leading order the
    * batch sketch sorts by), and the value payload breaks 64-bit hash
    * COLLISIONS deterministically, so two distinct rows colliding on
    * hash both stay in the buffer and the result is independent of
    * update/merge order (the batch sketch breaks the same tie by key;
    * under a collision whose values order differently than the keys
    * the two can diverge — probability ~k·n/2⁻⁶⁴, the accepted KMV
    * caveat). RE-DELIVERY of a row is a no-op (same (hash, value)
    * pair, at-least-once safe) and the union of two samples is the
    * merge of their bottom-k's — the KMV argument applied to sampling.
    * Emits the sample's VALUES ordered by (value, hash) ascending,
    * ready for the interpolation-free index-rule quantile
    * (`v[floor(q·(n-1))]`), which makes streamed window profiles equal
    * the batch sketch on the same rows. */
  case class BottomKSample(
      hash: Expression,
      value: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

    require(k >= 1, "BottomKSample needs k >= 1")

    override def left: Expression = hash
    override def right: Expression = value

    @transient private lazy val ord: Ordering[(Long, Long)] = Ordering.Tuple2[Long, Long]

    override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
      new java.util.TreeSet[(Long, Long)](ord)

    private def put(buf: java.util.TreeSet[(Long, Long)], h: Long, v: Long): Unit = {
      val e = (h, v)
      if (buf.size < k || ord.lt(e, buf.last())) {
        buf.add(e)
        if (buf.size > k) buf.pollLast()
      }
    }

    override def update(buf: java.util.TreeSet[(Long, Long)],
                        input: InternalRow): java.util.TreeSet[(Long, Long)] = {
      val h = hash.eval(input)
      val v = value.eval(input)
      if (h != null && v != null) put(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
      buf
    }

    override def merge(b1: java.util.TreeSet[(Long, Long)],
                       b2: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
      val it = b2.iterator()
      while (it.hasNext) {
        val e = it.next()
        put(b1, e._1, e._2)
      }
      b1
    }

    override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
      val entries = new Array[(Long, Long)](buf.size) // (value, hash)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next(); entries(i) = (e._2, e._1); i += 1
      }
      java.util.Arrays.sort(entries, Ordering.Tuple2[Long, Long])
      new GenericArrayData(entries.map(_._1))
    }

    override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * buf.size)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) { val e = it.next(); bb.putLong(e._1); bb.putLong(e._2) }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { val h = bb.getLong; val v = bb.getLong; buf.add((h, v)); i += 1 }
      buf
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): BottomKSample =
      copy(hash = newLeft, value = newRight)
    override def prettyName: String = "bottom_k_sample"
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge.{toColumn, toExpr}

  /** Aggregate Column: values of the bottom-k-by-`hash` sample,
    * ordered by (value, hash) — feed the SIGNED [[Hashing.hashLong64]]
    * of the row key, matching the batch sketch's sort. */
  def bottomKSample(hash: Column, value: Column, k: Int): Column =
    toColumn(BottomKSample(toExpr(hash), toExpr(value), k).toAggregateExpression())

  /** Aggregate Column: ascending array of the k smallest distinct
    * 63-bit-masked hashes. Feed it an already-hashed long column
    * (e.g. [[Hashing.hashLong64]]). */
  def kMinValues(hashed: Column, k: Int): Column =
    toColumn(KMinValues(toExpr(hashed), k).toAggregateExpression())

  /** Aggregate Column: row-major depth×width Count-Min counter matrix
    * over an already-hashed long column. */
  def countMin(hashed: Column, depth: Int, width: Int): Column =
    toColumn(CountMinSketch(toExpr(hashed), depth, width).toAggregateExpression())
}
