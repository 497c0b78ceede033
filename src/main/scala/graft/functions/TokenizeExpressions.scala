package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Shared analysis-time gate for the string-input kernels: SQL misuse
  * fails in the analyzer rather than as a ClassCastException in codegen.
  */
private[functions] trait StringInputCheck { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }
}

/** Fused tokenize→n-gram→hash kernels. Semantically identical to the
  * composable Column pipeline in graft.llm.TextOps (split on ' ', drop
  * empties, space-joined n-grams, whole-text fallback when too short,
  * StrHash) and to the DuckDB oracle — but one pass over the string,
  * no per-element lambda dispatch, no intermediate arrays of strings.
  */
object TokenHash {

  private final val P = StrHash.P

  @inline private def hashRange(s: String, from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) {
      acc = (acc * 31 + s.charAt(i)) % P
      i += 1
    }
    acc
  }

  /** Split positions of non-empty words: (start, end) pairs. */
  private def wordBounds(s: String): mutable.ArrayBuffer[(Int, Int)] = {
    val out = mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && s.charAt(i) != ' ') i += 1
      if (i > start) out += ((start, i))
    }
    out
  }

  /** Hash of words[from..from+n) joined with single spaces — identical
    * to StrHash of the concatenated shingle string (separator chars
    * hash in between words).
    */
  @inline private def shingleHash(s: String, ws: mutable.ArrayBuffer[(Int, Int)], from: Int, n: Int): Long = {
    var acc = 0L
    var w = from
    val end = from + n
    while (w < end) {
      if (w > from) acc = (acc * 31 + ' ') % P
      val (a, b) = ws(w)
      var i = a
      while (i < b) {
        acc = (acc * 31 + s.charAt(i)) % P
        i += 1
      }
      w += 1
    }
    acc
  }

  /** Distinct word-n-gram shingle hashes; [hash(text)] when the doc has
    * fewer than n words (TextOps.shingleHashes semantics).
    */
  def shingleHashes(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    val ws = wordBounds(s)
    if (ws.length < n) {
      new GenericArrayData(Array(hashRange(s, 0, s.length)))
    } else {
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      val last = ws.length - n
      while (i <= last) {
        seen.add(shingleHash(s, ws, i, n))
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next(); j += 1 }
      new GenericArrayData(out)
    }
  }

  /** POSITIONED word-n-gram shingle hashes: slot i is the hash of the
    * shingle starting at word i — ordered, NON-distinct (unlike
    * [[shingleHashes]], duplicates stay so corpus-level occurrence
    * counts see within-doc repeats), and EMPTY when the doc has fewer
    * than n words (a short doc has no n-word span to cut).
    */
  def shingleHashesPos(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    val ws = wordBounds(s)
    if (ws.length < n) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](ws.length - n + 1)
      var i = 0
      while (i <= ws.length - n) {
        out(i) = shingleHash(s, ws, i, n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** SimHash feature hashes: per word-bigram g, strhash(g + "#")*P +
    * strhash(g), with multiplicity; [pairHash(text)] when fewer than 2
    * words (TextOps.simhashFeatures semantics).
    */
  def bigramPairHashes(u: UTF8String): ArrayData = {
    val s = u.toString
    val ws = wordBounds(s)
    if (ws.length < 2) {
      val h = hashRange(s, 0, s.length)
      val hh = (h * 31 + '#') % P
      new GenericArrayData(Array(hh * P + h))
    } else {
      val out = new Array[Long](ws.length - 1)
      var i = 0
      while (i < ws.length - 1) {
        val h = shingleHash(s, ws, i, 2)
        val hh = (h * 31 + '#') % P
        out(i) = hh * P + h
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Char n-gram fingerprint hashes via a TRUE rolling hash: the window
  * polynomial is updated in O(1) per position (subtract the outgoing
  * char's 31^(g-1) term, shift, add the incoming char) instead of
  * re-hashing every g-char substring — O(n) per doc, no allocations.
  * Produces exactly `sort(distinct(filter(strhash(gram_i) % mod == 0)))`
  * like the composable formulation and the DuckDB oracle.
  */
object RollingFp {
  def eval(u: UTF8String, gram: Int, mod: Long): ArrayData = {
    val p = StrHash.P
    val s = u.toString
    val n = s.length
    val out = new java.util.TreeSet[java.lang.Long]()
    if (n < gram) {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * 31 + s.charAt(i)) % p; i += 1 }
      if (h % mod == 0) out.add(h)
    } else {
      // 31^(gram-1) mod P for removing the outgoing character
      var pow = 1L
      var e = 0
      while (e < gram - 1) { pow = (pow * 31) % p; e += 1 }
      var h = 0L
      var i = 0
      while (i < gram) { h = (h * 31 + s.charAt(i)) % p; i += 1 }
      if (h % mod == 0) out.add(h)
      while (i < n) {
        val outc = s.charAt(i - gram)
        h = (((h - outc * pow) % p + p) % p * 31 + s.charAt(i)) % p
        if (h % mod == 0) out.add(h)
        i += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }
}

/** ROBUST WINNOWING (Schleimer, Wilkerson & Aiken 2003, "Winnowing:
  * Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm): the window-minimum fingerprint selection with the
  * GUARANTEE mod-sampling ([[RollingFp]]) lacks — any shared
  * substring of length ≥ gram + window − 1 contributes at least one
  * shared fingerprint, and no shared fingerprint arises from matches
  * shorter than gram. Rolling O(1) hash update plus a monotone deque
  * gives O(n) per doc; output = sorted distinct window-min hashes
  * (tie POSITION choice never changes the selected VALUE, so the
  * distinct-hash set is tie-rule-free and exactly SQL-replayable via
  * per-window `list_min`). Texts with fewer grams than the window
  * still emit their overall minimum (≥ 1 fingerprint whenever ≥ 1
  * gram exists); texts shorter than gram emit none.
  */
object Winnow {
  def eval(u: UTF8String, gram: Int, window: Int): ArrayData = {
    val p = StrHash.P
    val s = u.toString
    val n = s.length
    val out = new java.util.TreeSet[java.lang.Long]()
    if (n >= gram) {
      val m = n - gram + 1
      val hs = new Array[Long](m)
      var pow = 1L
      var e = 0
      while (e < gram - 1) { pow = (pow * 31) % p; e += 1 }
      var h = 0L
      var i = 0
      while (i < gram) { h = (h * 31 + s.charAt(i)) % p; i += 1 }
      hs(0) = h
      while (i < n) {
        val outc = s.charAt(i - gram)
        h = (((h - outc * pow) % p + p) % p * 31 + s.charAt(i)) % p
        hs(i - gram + 1) = h
        i += 1
      }
      if (m <= window) {
        var mn = hs(0)
        var j = 1
        while (j < m) { if (hs(j) < mn) mn = hs(j); j += 1 }
        out.add(mn)
      } else {
        // monotone deque of indices with increasing hash values
        val dq = new Array[Int](m)
        var head = 0
        var tail = 0
        var j = 0
        while (j < m) {
          while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
          dq(tail) = j
          tail += 1
          if (dq(head) <= j - window) head += 1
          if (j >= window - 1) out.add(hs(dq(head)))
          j += 1
        }
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }
}

/** `winnow(text, gram, window)` as a codegen-capable expression. */
case class WinnowFingerprints(child: Expression, gram: Int, window: Int)
    extends UnaryExpression with StringInputCheck {
  require(gram >= 1 && window >= 1, s"gram/window must be >= 1, got $gram/$window")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    Winnow.eval(input.asInstanceOf[UTF8String], gram, window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.eval($c, $gram, $window)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
  override def prettyName: String = "graft_winnow"
}

case class RollingFpHashes(child: Expression, gram: Int, mod: Long)
    extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    RollingFp.eval(input.asInstanceOf[UTF8String], gram, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingFp.eval($c, $gram, ${mod}L)")
  override protected def withNewChildInternal(newChild: Expression): RollingFpHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_rolling_fp"
}

/** `shingleHashes(text, n)` as a codegen-capable expression. */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TokenHash.shingleHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHash.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

/** `shingleHashesPos(text, n)` as a codegen-capable expression. */
case class ShingleHashesPos(child: Expression, n: Int)
    extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TokenHash.shingleHashesPos(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHash.shingleHashesPos($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesPos =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes_pos"
}

/** ASCII char-class counting over raw UTF-8 bytes. A-Z/a-z occupy
  * single-byte code units and UTF-8 continuation/lead bytes are all
  * >= 0x80, so counting matching BYTES equals counting matching CHARS —
  * one pass, no String materialization, no regex (replaces the
  * `length(regexp_replace(t, "[^A-Za-z]", ""))` formulation on the text
  * quality hot path; the DuckDB oracle keeps the regexp spelling, the
  * counts are identical).
  */
object CharClassKernels {
  def asciiAlphaCount(u: UTF8String): Long = {
    val n = u.numBytes()
    var i = 0
    var c = 0L
    while (i < n) {
      val b = u.getByte(i)
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) c += 1
      i += 1
    }
    c
  }
}

/** `asciiAlphaCount(text)` as a codegen-capable expression. */
case class AsciiAlphaCount(child: Expression)
    extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    CharClassKernels.asciiAlphaCount(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharClassKernels.asciiAlphaCount($c)")
  override protected def withNewChildInternal(newChild: Expression): AsciiAlphaCount =
    copy(child = newChild)
  override def prettyName: String = "graft_alpha_count"
}

/** `bigramPairHashes(text)` as a codegen-capable expression. */
case class BigramPairHashes(child: Expression)
    extends UnaryExpression with StringInputCheck {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TokenHash.bigramPairHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHash.bigramPairHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): BigramPairHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_bigram_hashes"
}
