package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a first-class
  * Catalyst aggregate — the point-frequency sibling of
  * [[HeavyHitters]]: where Misra–Gries answers "which terms are
  * heavy", count-min answers "about how often did THIS term occur"
  * for ANY term, in depth × width longs. Each of `depth` rows hashes
  * the term into one of `width` counters ([[CmsHash.bucket]] — the
  * shared [[StrHash]] under a per-row salt, so the probe side and the
  * DuckDB oracle route identically); an estimate is the MINIMUM of the
  * term's `depth` counters — never an undercount, overcount bounded by
  * e·n/width with probability 1 − e^−depth. Counters are exact longs
  * added in, so the sketch is a pure function of the input multiset:
  * deterministic, mergeable by elementwise addition
  * ([[CountMinMerge]]), and replayable bit-for-bit by the oracle
  * (unlike engine-private HLL/CMS register layouts).
  *
  * The 100 TB shape: one hash-aggregate keyed by the group — each task
  * folds its token arrays into the depth×width buffer in place (no
  * explode), the exchange carries depth×width longs per (task, group)
  * however long the stream, and per-slice sketches persist as tiny
  * artifacts any coarser slicing merges without re-tokenizing
  * (the [[KmvDistinct]]/[[HeavyHitters]] roll-up economy). Serializes
  * through the state store, so the streaming corpus monitor can carry
  * it like the other sketches.
  *
  * Layout: the flattened row-major `array<bigint>` of depth × width
  * counters (row r, bucket b at index r·width + b).
  */
case class CountMin(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"count-min depth must be in 1..16, got $depth")
  require(width >= 2, s"count-min width must be >= 2, got $width")

  override def prettyName: String = "graft_count_min"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) {
          val t = a.getUTF8String(i)
          var r = 0
          while (r < depth) {
            buf(r * width + CmsHash.bucket(t, r, width)) += 1L
            r += 1
          }
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMin =
    copy(child = newChild)
}

/** Elementwise-sum merge of persisted [[CountMin]] artifacts — the
  * roll-up twin ([[HeavyHittersMerge]] discipline): count-min counters
  * are linear, so the merged sketch is IDENTICAL to the sketch built
  * directly from the concatenated streams (no truncation step, no
  * error growth beyond the widened n). All input arrays must share one
  * depth × width geometry; a mismatched artifact fails loudly rather
  * than mis-adding (the frozen-modulus contract).
  */
case class CountMinMerge(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_count_min_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def add(buf: Array[Long], other: Array[Long]): Array[Long] = {
    if (other.length == 0) buf
    else if (buf.length == 0) other.clone()
    else {
      require(buf.length == other.length,
        s"count-min artifacts disagree on geometry: ${buf.length} vs ${other.length} counters")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
      buf
    }
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr == null) buf
    else {
      val a = arr.asInstanceOf[ArrayData]
      add(buf, a.toLongArray())
    }
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    add(buf, other)

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinMerge =
    copy(child = newChild)
}

/** The count-min bucket routing, shared by the aggregate's JVM fold,
  * the Column-side probe ([[graft.llm.Sketches.cmsEstimate]]) and the
  * DuckDB oracle: row r routes term t to
  * `pmod(strhash("cm<r>:" + t), width)`. One definition — the
  * build/probe/oracle triple can never drift (the TextIndex
  * frozen-hash rule applied to a sketch).
  */
object CmsHash {
  def salt(row: Int): String = s"cm$row:"

  def bucket(term: UTF8String, row: Int, width: Int): Int = {
    val salted = UTF8String.concat(UTF8String.fromString(salt(row)), term)
    val h = StrHash.hash(salted) % width
    (if (h < 0) h + width else h).toInt
  }
}
