package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.types.StringType

/** Registration surface for graft's custom Catalyst expressions.
  *
  * Two ways in:
  *  - [[GraftFunctions.register]] on an existing session (used by the
  *    Verify/Bench mains and tests);
  *  - [[GraftExtensions]] via
  *    `spark.sql.extensions=graft.functions.GraftExtensions` for
  *    cluster deployments where the session is built elsewhere.
  */
object GraftFunctions {

  private val registry: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (
        FunctionIdentifier("graft_strhash"),
        new ExpressionInfo(classOf[StrHash].getName, "graft_strhash"),
        (es: Seq[Expression]) => StrHash(es.head)
      )
    )

  def register(spark: SparkSession): Unit = registry.foreach { case (id, info, builder) =>
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  /** Column-API handle on [[StrHash]] — no session registration needed.
    * Input is cast to string (StrHash declares no implicit coercions).
    */
  def strhash(c: Column): Column =
    Bridge.column(StrHash(Bridge.expression(c.cast(StringType))))
}

/** `SparkSessionExtensions` injection point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("graft_strhash"),
        new ExpressionInfo(classOf[StrHash].getName, "graft_strhash"),
        (es: Seq[Expression]) => StrHash(es.head)
      )
    )
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
