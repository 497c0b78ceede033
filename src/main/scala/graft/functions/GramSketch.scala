package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable second-moment buffer: `d` dimensions (−1 until the first
  * vector fixes it), the vector count, and one exact 128-bit
  * fixed-point accumulator per cell — `d` first-moment cells in
  * micro-units (10⁻⁶) followed by the `d·(d+1)/2` upper-triangle
  * product cells in pico-units (10⁻¹²). Two longs per cell (two's
  * complement hi:lo) keep the fold allocation-free per row while
  * staying exact to |Σ| < 2¹²⁷ ≈ 1.7e38 — far past any corpus size
  * (the decimal(38,12) sum the oracle computes overflows first).
  */
final class GramBuffer(var d: Int, var n: Long, var lo: Array[Long], var hi: Array[Long]) {

  def cells: Int = d + d * (d + 1) / 2

  /** 128-bit accumulate of a signed long: unsigned carry out of the
    * low word plus the addend's sign extension into the high word.
    */
  @inline def add(idx: Int, p: Long): Unit = {
    val l = lo(idx)
    val s = l + p
    hi(idx) += (((l & p) | ((l | p) & ~s)) >>> 63) + (p >> 63)
    lo(idx) = s
  }

  /** 128-bit accumulate of another cell's (hi, lo). */
  @inline def add128(idx: Int, oHi: Long, oLo: Long): Unit = {
    val l = lo(idx)
    val s = l + oLo
    hi(idx) += oHi + (((l & oLo) | ((l | oLo) & ~s)) >>> 63)
    lo(idx) = s
  }

  def init(dim: Int): Unit = {
    d = dim
    lo = new Array[Long](cells)
    hi = new Array[Long](cells)
  }

  /** The exact integer value of a cell as a BigInteger. */
  def big(idx: Int): java.math.BigInteger =
    java.math.BigInteger.valueOf(hi(idx)).shiftLeft(64)
      .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo(idx))))
}

/** One-pass exact second-moment sheet of a quantized embedding column
  * — the distributed half of PCA ([[graft.llm.Embeddings]]) as a
  * single Catalyst aggregate, replacing the former explode + vid
  * self-join plan (rows × d shuffle rows, rows × d²/2 pair rows into
  * the partial aggregate) with the [[CountMin]]/[[KmvDistinct]]
  * buffer economy: each task folds raw vectors into a d·(d+3)/2-cell
  * fixed-point buffer IN PLACE (no explode, no join), and the
  * exchange carries ONE ~2·cells·8-byte buffer per task however large
  * the corpus. At 100 TB this is the difference between shuffling the
  * corpus × d and shuffling tasks × d².
  *
  * Cross-engine exactness (the quantize-once discipline the join
  * plan established, unchanged): each component runs the IDENTICAL
  * sequence Spark's Column pipeline ran —
  * `round(cast(x as double), 6)` (decimal-text BigDecimal, HALF_UP)
  * → `cast(decimal(18,6))` (HALF_UP re-round of the double) — then
  * enters the buffer as an exact micro-unit long; products accumulate
  * in exact pico-units. Final values surface as the double cast of
  * the exact decimal (scale 12 for products, 6 for moments), which is
  * bit-identical to `CAST(sum(a.q*b.q) AS DOUBLE)` in both Spark and
  * the DuckDB oracle ([[graft.llm.Embeddings.gramSql]] — unchanged).
  *
  * Output: `array<struct<i,j,cnt,g>>` — for 1 ≤ i ≤ j ≤ d the exact
  * `Σ q_i·q_j` plus one `j = −1` row per dimension carrying `Σ q_i`,
  * `cnt` = vector count (the sheet [[graft.llm.Embeddings.gram]]
  * inlines). Contract: all vectors share one dimension and carry no
  * null elements; a ragged or null-holed corpus fails loudly (the
  * frozen-geometry rule) where the old join silently under-counted.
  * Component magnitude must stay below ~3.0e3 (micro-unit products
  * within long range) — enforced via Math.multiplyExact.
  */
case class GramSheet(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[GramBuffer]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_gram"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> input, got ${other.catalogString}")
  }

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): GramBuffer =
    new GramBuffer(-1, 0L, null, null)

  /** Spark's round(double, 6) → cast(decimal(18,6)) sequence, exactly:
    * decimal-text BigDecimal HALF_UP to 6 dp, back through the double,
    * HALF_UP again on the cast — then the exact micro-unit long.
    */
  private def qMicro(x: Double): Long = {
    // loud contract failure, not an opaque NumberFormatException from
    // BigDecimal (the old round->cast plan silently nulled non-finite
    // elements; this operator forbids them by contract)
    require(!x.isNaN && !x.isInfinite,
      s"$prettyName forbids non-finite vector components, saw $x")
    val rounded = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    BigDecimal(rounded).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .underlying.movePointRight(6).longValueExact
  }

  override def update(buf: GramBuffer, input: InternalRow): GramBuffer = {
    val arr = child.eval(input)
    if (arr == null) return buf
    val a = arr.asInstanceOf[ArrayData]
    val ne = a.numElements()
    if (buf.d == -1) buf.init(ne)
    require(ne == buf.d,
      s"$prettyName requires a fixed-dimension corpus: saw $ne after ${buf.d}")
    val micro = new Array[Long](ne)
    var i = 0
    while (i < ne) {
      require(!a.isNullAt(i), s"$prettyName forbids null components (index $i)")
      micro(i) = qMicro(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
      i += 1
    }
    buf.n += 1L
    var idx = buf.d // pair cells follow the d moment cells
    i = 0
    while (i < ne) {
      buf.add(i, micro(i))
      var j = i
      while (j < ne) {
        buf.add(idx, Math.multiplyExact(micro(i), micro(j)))
        j += 1
        idx += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: GramBuffer, other: GramBuffer): GramBuffer = {
    if (other.d == -1) buf
    else if (buf.d == -1) {
      buf.init(other.d)
      buf.n = other.n
      System.arraycopy(other.lo, 0, buf.lo, 0, buf.cells)
      System.arraycopy(other.hi, 0, buf.hi, 0, buf.cells)
      buf
    } else {
      require(buf.d == other.d,
        s"$prettyName buffers disagree on dimension: ${buf.d} vs ${other.d}")
      buf.n += other.n
      var idx = 0
      while (idx < buf.cells) {
        buf.add128(idx, other.hi(idx), other.lo(idx))
        idx += 1
      }
      buf
    }
  }

  override def eval(buf: GramBuffer): Any = {
    if (buf.d == -1) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](buf.cells)
    var k = 0
    var idx = buf.d
    var i = 0
    while (i < buf.d) {
      var j = i
      while (j < buf.d) {
        val g = new java.math.BigDecimal(buf.big(idx), 12).doubleValue
        out(k) = new GenericInternalRow(
          Array[Any]((i + 1).toLong, (j + 1).toLong, buf.n, g))
        k += 1
        j += 1
        idx += 1
      }
      i += 1
    }
    i = 0
    while (i < buf.d) {
      val g = new java.math.BigDecimal(buf.big(i), 6).doubleValue
      out(k) = new GenericInternalRow(Array[Any]((i + 1).toLong, -1L, buf.n, g))
      k += 1
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: GramBuffer): Array[Byte] = {
    if (buf.d == -1) return Array(0: Byte)
    val bb = ByteBuffer.allocate(1 + 4 + 8 + 16 * buf.cells)
    bb.put(1: Byte).putInt(buf.d).putLong(buf.n)
    var i = 0
    while (i < buf.cells) { bb.putLong(buf.lo(i)); bb.putLong(buf.hi(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == (0: Byte)) createAggregationBuffer()
    else {
      val buf = new GramBuffer(-1, 0L, null, null)
      buf.init(bb.getInt())
      buf.n = bb.getLong()
      var i = 0
      while (i < buf.cells) { buf.lo(i) = bb.getLong(); buf.hi(i) = bb.getLong(); i += 1 }
      buf
    }
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("g", DoubleType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSheet =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramSheet =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramSheet =
    copy(child = newChild)
}
