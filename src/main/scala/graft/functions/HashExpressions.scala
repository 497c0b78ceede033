package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial string hash `fold(chars)(acc -> (acc*31 + c) mod 1e9+7)`.
  *
  * This is the engine's cross-system content hash: every dedup /
  * fingerprint operator hashes shingles with it, and the DuckDB oracle
  * reproduces it in pure SQL (`list_reduce` over `ascii(substring(...))`)
  * so results hash-match across engines. Spark's builtin hashes
  * (murmur3/xxhash64) have no DuckDB equivalent, hence a custom
  * expression.
  *
  * Implemented as a native Catalyst expression with codegen (not a Scala
  * UDF): stays inside whole-stage codegen with no
  * serialization/boxing per row — the hot path of MinHash at 100 TB is
  * exactly this loop.
  *
  * Characters are UTF-16 code units; for ASCII corpora (ours) these equal
  * the Unicode code points DuckDB's `ascii()` returns.
  */
case class StrHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_strhash"

  // analysis-time gate: SQL misuse (graft_strhash(int_col)) should fail
  // in the analyzer, not as a ClassCastException inside codegen
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    StrHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StrHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): StrHash =
    copy(child = newChild)
}

object StrHash {
  /** Modulus: largest 10-digit prime; products a*x with a,x < P stay
    * within Long range.
    */
  final val P = 1000000007L

  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      acc = (acc * 31 + str.charAt(i)) % P
      i += 1
    }
    acc
  }
}

/** Strict left-to-right-fold dot product over two `array<double>`
  * columns: sum += a(i)*b(i), i ascending — the exact summation order the
  * DuckDB oracle's `list_reduce` uses, so cosines match bit-for-bit.
  *
  * Native expression (codegen) instead of `aggregate(zip_with(...))`:
  * the HOF pipeline allocates a zipped array and boxes every element —
  * at O(pairs × dims) evaluations (brute-force similarity is 2M pairs ×
  * 64 dims at sf0.1 alone) the tight loop below is the difference
  * between seconds and minutes.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> args, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)

  override def prettyName: String = "graft_vecdot"
}

object VecDot {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
