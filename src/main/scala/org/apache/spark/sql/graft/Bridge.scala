package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge into `private[sql]` surface: Column <-> Catalyst
  * Expression conversion for registering custom expressions from the
  * Column API (Spark 4 moved Column onto ColumnNode; classic
  * conversions are sql-private).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (classic Dataset.ofRows is
    * sql-private). Used to hand custom logical operators to Catalyst.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  ): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan
    )

  /** The analyzed logical plan of a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]].logicalPlan

  /** Build an independent session over an existing SparkContext with the
    * given SparkSessionExtensions builder applied — what
    * `spark.sql.extensions=<class>` does at cluster-session construction
    * (the classic constructor is sql-private). Lets tests exercise the
    * extensions injection path without tearing down the shared session.
    */
  def newSessionWithExtensions(
      base: org.apache.spark.sql.SparkSession,
      build: org.apache.spark.sql.SparkSessionExtensions => Unit
  ): org.apache.spark.sql.SparkSession = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    build(ext)
    // the primary constructor is Scala-private (only the two auxiliary
    // ones are package-visible) but bytecode-public — reflect
    val ctor = classOf[org.apache.spark.sql.classic.SparkSession].getConstructor(
      classOf[org.apache.spark.SparkContext],
      classOf[Option[_]],
      classOf[Option[_]],
      classOf[org.apache.spark.sql.SparkSessionExtensions],
      classOf[scala.collection.immutable.Map[_, _]],
      classOf[scala.collection.immutable.Map[_, _]])
    ctor.newInstance(base.sparkContext, None, None, ext,
      Map.empty[String, String], Map.empty[String, String])
  }
}
