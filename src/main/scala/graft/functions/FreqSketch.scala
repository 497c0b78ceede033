package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a first-class Catalyst aggregate
  * — the frequency sibling of [[KmvDistinct]]'s cardinality sketch.
  *
  * Misra–Gries (1982; merged summaries per Agarwal et al. 2013): keep
  * at most k counters. A seen term increments its counter; an unseen
  * term claims a free counter, or — when all k are taken — decrements
  * EVERY counter (dropping zeros), charging one occurrence of each
  * tracked term against the new one. Guarantees, for stream length n:
  * estimates never exceed true counts, undercount by at most n/(k+1),
  * and every term with true frequency > n/(k+1) is present. When the
  * group's distinct-term count never exceeds k, no decrement ever fires
  * and the sketch IS the exact count map — deterministic, which is what
  * the DuckDB oracle pins (the same below-capacity exactness contract
  * as KMV).
  *
  * The 100 TB shape this buys: per-group top terms WITHOUT a
  * (group, term)-keyed shuffle. Each task folds its partition into an
  * O(k) buffer, partial buffers ship as ≤k (term, count) pairs, and
  * merge adds counts then truncates to the k largest (subtracting the
  * (k+1)-th count — the standard mergeable-summary step, same error
  * bound). Shuffle volume is O(groups·k), never O(distinct terms); the
  * input is the per-row token array, consumed in place with no explode.
  *
  * Returns the sketch as an array of (term, cnt) structs sorted by
  * (cnt desc, term) — a deterministic layout when exact.
  */
case class HeavyHitters(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
    with UnaryLike[Expression] {

  require(k > 0, s"heavy-hitters sketch needs k > 0, got $k")

  override def prettyName: String = "graft_heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  private def insert(buf: java.util.HashMap[String, java.lang.Long], term: String): Unit = {
    val cur = buf.get(term)
    if (cur != null) { buf.put(term, cur + 1L); () }
    else if (buf.size < k) { buf.put(term, 1L); () }
    else {
      // all counters taken: charge one occurrence of every tracked term
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  override def update(
      buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow
  ): java.util.HashMap[String, java.lang.Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      var i = 0
      while (i < n) {
        // toString copies out of the (possibly reused) UTF8String buffer
        if (!a.isNullAt(i)) insert(buf, a.getUTF8String(i).toString)
        i += 1
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long]
  ): java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else java.lang.Long.valueOf(cur + e.getValue))
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0 —
      // the mergeable-summaries truncation (keeps the MG error bound)
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val threshold = counts(buf.size - k - 1) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= threshold) eit.remove()
        else e.setValue(e.getValue - threshold)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      val e = it0.next()
      bytes += 4 + e.getKey.getBytes(StandardCharsets.UTF_8).length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(tb.length); bb.put(tb); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      m.put(new String(tb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

/** Merges [[HeavyHitters]] sketch arrays — one (term, cnt)-pair array
  * per input row — into the combined sketch: the mergeable-summaries
  * MG merge (Agarwal et al. 2013) lifted to a first-class aggregate,
  * so per-slice sketches persisted as tiny artifacts roll up a
  * hierarchy (source → corpus, day → month) without re-reading any
  * token stream. Each input array's counts add into the buffer, then
  * the buffer truncates to the k largest by subtracting the (k+1)-th
  * count — the identical step [[HeavyHitters.merge]] applies to its
  * partial buffers, preserving the n/(k+1) undercount bound. When
  * every level stays below capacity no truncation fires and the merge
  * IS the exact count sum — the deterministic regime the DuckDB
  * oracle pins.
  */
case class HeavyHittersMerge(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
    with UnaryLike[Expression] {

  require(k > 0, s"heavy-hitters sketch needs k > 0, got $k")

  override def prettyName: String = "graft_heavy_hitters_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, StringType, _, _), StructField(_, LongType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<term string, cnt bigint>> input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  /** Add counts, then truncate to k counters — MG summary merge. */
  private def addAndTruncate(
      buf: java.util.HashMap[String, java.lang.Long],
      add: Iterator[(String, Long)]
  ): java.util.HashMap[String, java.lang.Long] = {
    while (add.hasNext) {
      val (t, c) = add.next()
      val cur = buf.get(t)
      buf.put(t, if (cur == null) c else java.lang.Long.valueOf(cur + c))
    }
    if (buf.size > k) {
      val counts = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val threshold = counts(buf.size - k - 1) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= threshold) eit.remove()
        else e.setValue(e.getValue - threshold)
      }
    }
    buf
  }

  override def update(
      buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow
  ): java.util.HashMap[String, java.lang.Long] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      // null elements skipped — SQL callers can hand-build arrays
      addAndTruncate(buf, (0 until a.numElements()).iterator
        .filter(i => !a.isNullAt(i))
        .map { i =>
          val s = a.getStruct(i, 2)
          (s.getUTF8String(0).toString, s.getLong(1))
        })
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long]
  ): java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    addAndTruncate(buf, new Iterator[(String, Long)] {
      override def hasNext: Boolean = it.hasNext
      override def next(): (String, Long) = { val e = it.next(); (e.getKey, e.getValue) }
    })
  }

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      val e = it0.next()
      bytes += 4 + e.getKey.getBytes(StandardCharsets.UTF_8).length + 8
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val tb = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(tb.length); bb.put(tb); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val tb = new Array[Byte](len)
      bb.get(tb)
      m.put(new String(tb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersMerge =
    copy(child = newChild)
}
