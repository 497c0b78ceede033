package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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
case class BottomKSample(
    left: Expression,  // sampling key: long, hash-mixed, value-independent
    right: Expression, // sampled value: double
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]]
    with BinaryLike[Expression] {

  require(k > 0, s"bottom-k sample needs k > 0, got $k")

  override def prettyName: String = "graft_bottomk_sample"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint key, double value), got ${l.catalogString}, ${r.catalogString}")
    }

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  private def insert(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      key: Long,
      v: Double
  ): Unit = {
    val cur = buf.get(key)
    if (cur != null) {
      // key tie: keep the smaller value — a deterministic, engine-
      // mirrorable rule (min(value) per key), never insertion order
      if (v < cur) { buf.put(key, v); () }
    } else if (buf.size < k) {
      buf.put(key, v); ()
    } else if (key < buf.lastKey()) {
      buf.put(key, v)
      buf.pollLastEntry()
      ()
    }
  }

  override def update(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      input: InternalRow
  ): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val kv = left.eval(input)
    val vv = right.eval(input)
    if (kv != null && vv != null) {
      insert(buf, kv.asInstanceOf[Long], vv.asInstanceOf[Double])
    }
    buf
  }

  override def merge(
      buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
      other: java.util.TreeMap[java.lang.Long, java.lang.Double]
  ): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      insert(buf, e.getKey, e.getValue)
    }
    buf
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any = {
    val out = new Array[Double](buf.size)
    val it = buf.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.TreeMap[java.lang.Long, java.lang.Double]()
    var i = 0
    while (i < n) { m.put(bb.getLong, bb.getDouble); i += 1 }
    m
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSample =
    copy(left = newLeft, right = newRight)
}
