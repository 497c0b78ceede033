package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** K-minimum-values distinct-count sketch as a first-class Catalyst
  * aggregate.
  *
  * KMV (Bar-Yossef et al.; the estimator behind `DISTINCT`-sketching in
  * most engines): keep the k smallest DISTINCT hash values seen; with
  * hashes uniform on [0, P), the k-th smallest value h_k estimates the
  * distinct count as (k−1)·P / h_k, with relative error ≈ 1/√(k−2).
  * Unlike HLL the state is exact order statistics — fully DETERMINISTIC
  * given the hash, so the DuckDB oracle reproduces the sketch (and the
  * estimate) bit-for-bit with a rank-k window.
  *
  * This is the aggregation shape a 100 TB distinct-count needs: each
  * task folds its partition into an O(k) buffer (a capped TreeSet —
  * inserts past capacity evict the current max), partial buffers ship
  * as ≤k longs, and merge is the same capped insert — shuffle volume is
  * O(groups·k), never O(distinct values). The input column is the
  * per-document array of hashes (e.g. TextOps.shingleHashes), consumed
  * in place — no explode shuffle ever materializes the value stream.
  *
  * Returns the ascending array of the ≤k minimum distinct values (the
  * full sketch — callers derive count estimates, and sketches of
  * disjoint corpora union by re-inserting, which [[merge]] is).
  */
case class KmvDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  require(k > 1, s"KMV needs k > 1, got $k")

  override def prettyName: String = "graft_kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    SketchKernels.requireLongArray(prettyName, child)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) {
      buf.add(v); ()
    } else if (v < buf.last()) {
      // strictly below the current max: evict it iff v was genuinely new
      if (buf.add(v)) { buf.pollLast(); () }
    }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow
  ): java.util.TreeSet[java.lang.Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      var i = 0
      // skip null elements: the SQL-registered signature accepts
      // array<bigint> with nullable elements, and getLong on a null
      // slot would silently fold a 0 into the order statistics
      while (i < n) { if (!a.isNullAt(i)) insert(buf, a.getLong(i)); i += 1 }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]
  ): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
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
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}
