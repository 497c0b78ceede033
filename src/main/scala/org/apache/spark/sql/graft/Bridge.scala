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

  /** Drop the carried-over origin statistics from a checkpointed
    * frame's `LogicalRDD` leaf (everything else — RDD, partitioning,
    * ordering — is preserved, so this costs nothing at runtime).
    *
    * Why: Spark 4 propagates the CHILD plan's estimated statistics
    * into the `LogicalRDD` a checkpoint produces (origin stats). In an
    * iterative operator whose rounds join the previous round's
    * checkpoint several times, the estimated `sizeInBytes` MULTIPLIES
    * each round — the BigInt's digit count grows geometrically across
    * rounds/levels, and by a few compounded levels the driver wedges
    * for minutes inside stats estimation (BigInteger Toom-Cook on
    * million-digit numbers — observed 6.6s → 50.7s → minutes per
    * round planning louvainMultiLevel level 3 on a 63-edge graph).
    * Resetting to the default leaf estimate bounds the growth to one
    * round; AQE re-plans with real runtime sizes anyway.
    *
    * AQE DEPENDENCY (r12 ADVICE): with originStats dropped the leaf
    * reports `spark.sql.defaultSizeInBytes` (Long.MaxValue), so the
    * STATIC planner will never broadcast a reset frame — tiny
    * per-round frames (kCore alive sets, HITS score tables) rely on
    * AQE's runtime re-planning to recover broadcast joins. AQE is on
    * by default in Spark 4 and never disabled in this repo; an
    * AQE-off deployment should re-point iterative loops at a bounded
    * constant estimate instead.
    */
  def resetStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.logicalPlan match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        ofRows(ds.sparkSession,
          org.apache.spark.sql.execution.LogicalRDD(
            l.output, l.rdd, l.outputPartitioning, l.outputOrdering, l.isStreaming, l.stream)(
            ds.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession], None, None))
      case _ => df
    }
  }

  /** Re-declare the physical layout of a checkpointed frame's
    * `LogicalRDD` leaf: hash-partitioning on `keyNames` and an
    * ascending per-partition sort on `sortNames` — the in-memory
    * analogue of a bucketed+sorted table (guide §2.4: a persisted
    * partitioning lets repeated joins/aggregations on the key skip
    * their exchange entirely).
    *
    * Why it is needed: `localCheckpoint` materializes through whatever
    * physical plan AQE produced, and under AQE the captured
    * `outputPartitioning` is `UnknownPartitioning` (the logical-RDD
    * conversion happens before the adaptive plan finalizes), so every
    * iterative operator re-shuffled its STATIC edge/feature table on
    * every round's keyed join — N-1 redundant full-table exchanges
    * (and sorts) for an N-round loop.
    *
    * SAFETY CONTRACT — the claim must be true by construction: call
    * this ONLY on a frame of the shape
    * `df.repartition(n, keys).sortWithinPartitions(sorts).localCheckpoint(false)`.
    * `repartition(n, keys)` plans a REPARTITION_BY_NUM shuffle, which
    * AQE never coalesces or skew-splits (user-pinned partition count),
    * so the persisted RDD is EXACTLY `HashPartitioning(keys, n)` and
    * each partition is sorted; the claim merely restores what the
    * conversion dropped. Claiming a layout the rows do not have
    * produces silently wrong joins. [[graft.core.Layouts.ckptByKey]]
    * is the only intended caller and enforces the shape.
    *
    * Also drops carried-over origin statistics (the [[resetStats]]
    * rationale) — claimed frames are loop inputs and must not seed the
    * geometric stats growth.
    */
  def claimHashLayout(
      df: org.apache.spark.sql.DataFrame,
      keyNames: Seq[String],
      sortNames: Seq[String]
  ): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.logicalPlan match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        def attr(n: String) = l.output.find(_.name == n).getOrElse(
          throw new IllegalArgumentException(
            s"claimHashLayout: no column '$n' in ${l.output.map(_.name)}"))
        val part = org.apache.spark.sql.catalyst.plans.physical.HashPartitioning(
          keyNames.map(attr), l.rdd.getNumPartitions)
        val ord = sortNames.map(n =>
          org.apache.spark.sql.catalyst.expressions.SortOrder(
            attr(n), org.apache.spark.sql.catalyst.expressions.Ascending))
        ofRows(ds.sparkSession,
          org.apache.spark.sql.execution.LogicalRDD(
            l.output, l.rdd, part, ord, l.isStreaming, l.stream)(
            ds.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession], None, None))
      case other =>
        throw new IllegalArgumentException(
          s"claimHashLayout expects a localCheckpoint'd frame (LogicalRDD leaf), got ${other.nodeName}")
    }
  }

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
