package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Deterministic bottom-k-by-hash sample as a Catalyst aggregate — the
  * quantile member of the sketch family ([[KmvDistinct]] cardinality,
  * [[HeavyHitters]] frequency): keep the values whose sampling keys are
  * the k smallest seen. With keys uniform and independent of the
  * values (callers derive them from row ids through a mixing hash),
  * the kept set is a uniform k-sample of the group, and its order
  * statistics estimate the group's quantiles with ~1/√k error.
  *
  * Why not `approx_percentile`: Spark's GK/KLL state is engine-private
  * and merge-order dependent — it cannot be replayed by another engine.
  * This sketch is a pure function of the (key, value) multiset: inserts
  * past capacity evict the largest key, merge is the same capped
  * insert, and key ties keep the SMALLEST value — so any engine that
  * can rank by the same key (the DuckDB oracle does, with a rank-k
  * window) reproduces the sample and every quantile bit-for-bit.
  *
  * The 100 TB shape: per-group quantiles without sorting the corpus —
  * tasks fold partitions into O(k) buffers, the exchange carries ≤k
  * (key, value) pairs per (task, group). Returns the sample's VALUES
  * sorted ascending; callers index order statistics out of it.
  */
/** The shared bottom-k buffer: a TreeMap keyed by sampling key. Insert
  * semantics are a pure function of the (key, value) multiset —
  * capacity evicts the largest key, a key tie keeps the SMALLEST value
  * (a deterministic, engine-mirrorable rule — min(value) per key,
  * never insertion order) — so update and merge are the same capped
  * insert and every aggregate over this buffer is order-independent.
  */
private[functions] object BottomKBuf {
  type Buf = java.util.TreeMap[java.lang.Long, java.lang.Double]

  def empty: Buf = new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  def insert(buf: Buf, k: Int, key: Long, v: Double): Unit = {
    val cur = buf.get(key)
    if (cur != null) {
      if (v < cur) { buf.put(key, v); () }
    } else if (buf.size < k) {
      buf.put(key, v); ()
    } else if (key < buf.lastKey()) {
      buf.put(key, v)
      buf.pollLastEntry()
      ()
    }
  }

  def mergeInto(buf: Buf, k: Int, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(buf, k, e.getKey, e.getValue)
    }
    buf
  }

  def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putDouble(e.getValue)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = empty
    var i = 0
    while (i < n) { m.put(bb.getLong, bb.getDouble); i += 1 }
    m
  }

  /** Values only, sorted ascending — the order-statistics layout. */
  def sortedValues(buf: Buf): GenericArrayData = {
    val out = new Array[Double](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** (key, value) pairs in ascending-key order — the MERGEABLE layout:
    * re-feeding these pairs to a bottom-k aggregate reproduces the
    * sketch, which is what lets sketches roll up a hierarchy without
    * re-reading the raw stream.
    */
  def pairs(buf: Buf): GenericArrayData = {
    val out = new Array[InternalRow](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); out(i) = InternalRow(e.getKey.longValue(), e.getValue.doubleValue()); i += 1 }
    new GenericArrayData(out)
  }

  val pairsType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("value", DoubleType, nullable = false))),
    containsNull = false)
}

/** Common shell for the scalar-input bottom-k aggregates. */
abstract class BottomKAggBase
    extends TypedImperativeAggregate[BottomKBuf.Buf] with BinaryLike[Expression] {
  def left: Expression   // sampling key: long, hash-mixed, value-independent
  def right: Expression  // sampled value: double
  def k: Int

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint key, double value), got ${l.catalogString}, ${r.catalogString}")
    }

  override def createAggregationBuffer(): BottomKBuf.Buf = BottomKBuf.empty

  override def update(buf: BottomKBuf.Buf, input: InternalRow): BottomKBuf.Buf = {
    val kv = left.eval(input)
    val vv = right.eval(input)
    if (kv != null && vv != null) {
      BottomKBuf.insert(buf, k, kv.asInstanceOf[Long], vv.asInstanceOf[Double])
    }
    buf
  }

  override def merge(buf: BottomKBuf.Buf, other: BottomKBuf.Buf): BottomKBuf.Buf =
    BottomKBuf.mergeInto(buf, k, other)

  override def serialize(buf: BottomKBuf.Buf): Array[Byte] = BottomKBuf.serialize(buf)
  override def deserialize(bytes: Array[Byte]): BottomKBuf.Buf = BottomKBuf.deserialize(bytes)
  override def nullable: Boolean = false
}

case class BottomKSample(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends BottomKAggBase {

  require(k > 0, s"bottom-k sample needs k > 0, got $k")

  override def prettyName: String = "graft_bottomk_sample"

  override def eval(buf: BottomKBuf.Buf): Any = BottomKBuf.sortedValues(buf)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSample =
    copy(left = newLeft, right = newRight)
}

/** [[BottomKSample]] with the (key, value) pairs retained in the output
  * — the persistable/mergeable form of the sketch: [[BottomKMerge]]
  * (or this aggregate again, after an explode) folds pair arrays into
  * the identical sketch a direct pass over the raw stream builds,
  * because the kept set is a pure function of the (key, value)
  * multiset and bottom-k of a union of per-part bottom-k sets is the
  * bottom-k of the union.
  */
case class BottomKPairs(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends BottomKAggBase {

  require(k > 0, s"bottom-k sample needs k > 0, got $k")

  override def prettyName: String = "graft_bottomk_pairs"

  override def eval(buf: BottomKBuf.Buf): Any = BottomKBuf.pairs(buf)

  override def dataType: DataType = BottomKBuf.pairsType

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKPairs =
    copy(left = newLeft, right = newRight)
}

/** Merges [[BottomKPairs]] sketch arrays — one array per input row —
  * into the combined sketch, again in pairs form: the roll-up
  * aggregate. Each level of a hierarchy costs O(groups·k), never a
  * re-scan of the raw values.
  */
case class BottomKMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BottomKBuf.Buf]
    with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(k > 0, s"bottom-k sample needs k > 0, got $k")

  override def prettyName: String = "graft_bottomk_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _), StructField(_, DoubleType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<key bigint, value double>> input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): BottomKBuf.Buf = BottomKBuf.empty

  override def update(buf: BottomKBuf.Buf, input: InternalRow): BottomKBuf.Buf = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = a.numElements()
      var i = 0
      while (i < n) {
        // the Scala path never emits null elements (containsNull=false),
        // but SQL callers can hand-build arrays — skip, don't NPE
        if (!a.isNullAt(i)) {
          val s = a.getStruct(i, 2)
          BottomKBuf.insert(buf, k, s.getLong(0), s.getDouble(1))
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: BottomKBuf.Buf, other: BottomKBuf.Buf): BottomKBuf.Buf =
    BottomKBuf.mergeInto(buf, k, other)

  override def eval(buf: BottomKBuf.Buf): Any = BottomKBuf.pairs(buf)

  override def serialize(buf: BottomKBuf.Buf): Array[Byte] = BottomKBuf.serialize(buf)
  override def deserialize(bytes: Array[Byte]): BottomKBuf.Buf = BottomKBuf.deserialize(bytes)

  override def dataType: DataType = BottomKBuf.pairsType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BottomKMerge =
    copy(child = newChild)
}
