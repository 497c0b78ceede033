package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sketch kernels. The HOF formulations (`transform(sequence(..),
  * i -> array_min(transform(xs, ...)))`) are semantically identical but
  * run interpreted with per-element boxing — O(docs × k × shingles)
  * allocations. These expressions do the same integer arithmetic in
  * tight primitive loops and match the DuckDB oracle exactly (same
  * formulas, same constants — see graft.llm.TextOps).
  *
  * The kernels live in the standalone [[SketchKernels]] object, NOT the
  * expression companions: scalac emits no static forwarder for a
  * companion method whose name collides with a class member, and both
  * case classes inherit `Expression.eval(InternalRow)` — a companion
  * `eval` is therefore invisible to Janino and the generated Java fails
  * to compile, silently dropping the stage to interpreted execution.
  * (Same pattern as TokenHash / RollingFp in TokenizeExpressions.)
  */
object SketchKernels {
  /** Analysis-time type gate: argument must be array<bigint> (nullability
    * ignored) so SQL misuse fails at analysis, not inside codegen.
    */
  def requireLongArray(name: String, child: Expression): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$name requires array<bigint>, got ${other.catalogString}")
    }

  /** MinHash signature: out[i] = min over xs of ((a_i*x + b_i) mod P). */
  def minhash(xs: ArrayData, k: Int, aMul: Long, bMul: Long): ArrayData = {
    val p = StrHash.P
    val n = xs.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = (i * aMul) % (p - 1) + 1
      val b = (i * bMul + 7) % p
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = (a * xs.getLong(j) + b) % p
        if (h < best) best = h
        j += 1
      }
      out(i) = if (n == 0) 0L else best
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash: bit b of the result is set iff
    * sum over features h of (bit b of h ? +1 : -1) > 0, for b < bits.
    */
  def simhash(hs: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = hs.numElements()
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** MinHash signature: out[i] = min over xs of ((a_i*x + b_i) mod P),
  * a_i = (i*aMul mod (P-1)) + 1, b_i = (i*bMul + 7) mod P.
  */
case class MinHashSig(child: Expression, k: Int, aMul: Long, bMul: Long)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    SketchKernels.requireLongArray(prettyName, child)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhash(input.asInstanceOf[ArrayData], k, aMul, bMul)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.minhash($c, $k, ${aMul}L, ${bMul}L)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

/** SimHash over a feature-hash array; see [[SketchKernels.simhash]]. */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    SketchKernels.requireLongArray(prettyName, child)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}
