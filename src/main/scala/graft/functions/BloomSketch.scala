package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter membership sketch (Bloom, CACM 1970) as a first-class
  * Catalyst aggregate + probe expression — the approximate-membership
  * artifact an incremental-ingest gate keeps NEXT TO the accumulated
  * corpus so that each new batch can discard its definitely-new
  * documents with a scan-local filter and send only the bloom-positive
  * sliver (true duplicates + the designed false-positive rate) into
  * the exact confirm join. One-sided error — no false negatives — so
  * composing the bloom pre-filter with an exact join keyed by the
  * (strhash, md5) wide hash (the [[graft.llm.Dedup.exact]] convention)
  * yields EXACTLY the un-pre-filtered answer; the bloom only changes
  * the plan economics, never the result.
  *
  * The artifact is `[numHashes: int32 BE][bit words: int64 BE ...]` —
  * bit-OR-accumulated, so the build is order- and partition-
  * independent (byte-identical output on any cluster layout) and the
  * union of two corpora's blooms is the bitwise OR of their artifacts
  * ([[BloomOr]]): per-epoch/per-source blooms persist as tiny files
  * and any coarser slice is answered by OR-ing artifacts, never
  * re-scanning the corpus. Size it at ~10 bits and 5-7 hash functions
  * per expected distinct key for ~1% false positives; past ~10^9
  * accumulated keys a single artifact outgrows plan-literal shipping —
  * shard it per storage bucket alongside the
  * [[graft.state.BucketedDir]] key artifact and route probes with the
  * same bucket hash.
  *
  * Bit positions come from double hashing (Kirsch–Mitzenmacher): two
  * splitmix64-finalized hashes h1, h2 give position_i = (h1 + i*h2)
  * mod numBits — k independent-enough probes from two mixes.
  */
object BloomKernels {

  /** splitmix64 finalizer — the standard 64-bit avalanche mix. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  val HeaderBytes = 4

  def setBits(words: Array[Long], numHashes: Int, x: Long): Unit = {
    val numBits = words.length.toLong << 6
    val h1 = mix(x)
    val h2 = mix(x + 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(h1 + i * h2, numBits)
      words((idx >>> 6).toInt) |= (1L << (idx & 63L))
      i += 1
    }
  }

  /** Probe a serialized artifact — reads words straight off the bytes,
    * no deserialization copy (the artifact is typically a plan literal
    * evaluated once per row).
    */
  def contains(artifact: Array[Byte], x: Long): Boolean = {
    val numHashes = readHeader(artifact)
    val numBits = (artifact.length - HeaderBytes).toLong << 3
    val h1 = mix(x)
    val h2 = mix(x + 0x9E3779B97F4A7C15L) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Math.floorMod(h1 + i * h2, numBits)
      // words serialize big-endian (ByteBuffer.putLong): bit b of word w
      // lives in byte 7 - b/8 of that word's 8-byte span
      val word = (idx >>> 6).toInt
      val bit = (idx & 63L).toInt
      val byte = artifact(HeaderBytes + (word << 3) + (7 - (bit >>> 3)))
      if (((byte >>> (bit & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  def readHeader(artifact: Array[Byte]): Int =
    ((artifact(0) & 0xFF) << 24) | ((artifact(1) & 0xFF) << 16) |
      ((artifact(2) & 0xFF) << 8) | (artifact(3) & 0xFF)

  def toArtifact(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(HeaderBytes + 8 * words.length)
    bb.putInt(numHashes)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def fromArtifact(artifact: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(artifact, HeaderBytes, artifact.length - HeaderBytes)
    val words = new Array[Long]((artifact.length - HeaderBytes) >>> 3)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    words
  }

  /** Number of addressable bits in a serialized artifact. */
  def numBits(artifact: Array[Byte]): Long =
    (artifact.length - HeaderBytes).toLong << 3

  /** Set-bit count of a serialized artifact — the saturation telemetry
    * behind the fill-ratio rebuild policy (a bloom gate whose fill
    * ratio approaches 1 still answers correctly but prunes nothing).
    */
  def popcount(artifact: Array[Byte]): Long = {
    var n = 0L
    var i = HeaderBytes
    while (i < artifact.length) {
      n += java.lang.Integer.bitCount(artifact(i) & 0xFF)
      i += 1
    }
    n
  }

  /** Driver-side OR of two same-shape artifacts (the byte-level twin of
    * [[BloomOr]]'s aggregate merge, for artifacts already collected).
    * Shapes must match — a bloom dir's bit size is fixed for its life;
    * resizing means a rebuild into a fresh dir.
    */
  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length && readHeader(a) == readHeader(b),
      s"bloom artifacts disagree in shape (${a.length}/${readHeader(a)} vs " +
        s"${b.length}/${readHeader(b)}); resize requires a rebuild into a fresh dir")
    val out = a.clone()
    var i = HeaderBytes
    while (i < out.length) {
      out(i) = (out(i) | b(i)).toByte
      i += 1
    }
    out
  }
}

/** Builds the bloom artifact from a `bigint` key column (one key per
  * row — e.g. the strhash of each document's text). `numBits` rounds
  * up to a multiple of 64. Each task folds its partition into a local
  * bitset; partials merge by bitwise OR, so the exchange carries one
  * fixed-size bitset per (task, group) and the result is deterministic
  * under any partitioning.
  */
case class BloomBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(numBits > 0, s"bloom needs numBits > 0, got $numBits")
  require(numHashes > 0 && numHashes <= 32, s"bloom needs 1..32 hashes, got $numHashes")

  private val numWords = (numBits + 63) >>> 6

  override def prettyName: String = "graft_bloom_build"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires bigint, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomKernels.setBits(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomKernels.toArtifact(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomKernels.toArtifact(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomKernels.fromArtifact(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuild =
    copy(child = newChild)
}

/** Merges already-built bloom artifacts (one `binary` artifact per
  * input row) by bitwise OR — the persistable/mergeable form: the
  * bloom of a union of corpora IS the OR of their blooms, so per-slice
  * artifacts roll up to any coarser slice without touching raw data.
  * All inputs must agree on size and hash count (built with the same
  * parameters); mixed geometries fail loudly rather than probe wrong.
  */
case class BloomOr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  override def prettyName: String = "graft_bloom_or"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires binary, got ${other.catalogString}")
  }

  /** Empty sentinel until the first artifact arrives (geometry unknown). */
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def orInto(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buf
    else if (buf.isEmpty) other.clone()
    else {
      require(
        buf.length == other.length &&
          BloomKernels.readHeader(buf) == BloomKernels.readHeader(other),
        s"$prettyName: mismatched bloom geometries " +
          s"(${buf.length}B/k=${BloomKernels.readHeader(buf)} vs " +
          s"${other.length}B/k=${BloomKernels.readHeader(other)})")
      var i = BloomKernels.HeaderBytes
      while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
      buf
    }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf else orInto(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    orInto(buf, other)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomOr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomOr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomOr =
    copy(child = newChild)
}

/** `graft_bloom_contains(artifact, key)` — true iff `key` MAY be in the
  * set the artifact summarizes (false ⇒ definitely absent). Codegen'd
  * straight onto the serialized bytes, so a plan-literal artifact
  * probes at memory speed inside whole-stage codegen.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression
    with BinaryLike[Expression] {

  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (binary, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(artifact: Any, x: Any): Any =
    BloomKernels.contains(artifact.asInstanceOf[Array[Byte]], x.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, x) => s"graft.functions.BloomKernels.contains($b, $x)")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): BloomContains = copy(left = newLeft, right = newRight)
}
