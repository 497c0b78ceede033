package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed joins with the reference's feature-table semantics
  * (ralf/operators/join.py:10-63). ralf's LeftJoin is a 2-stream keyed
  * join where the right side acts as a latest-value table and unmatched
  * left records buffer until a right record arrives, each buffered left
  * being consumed exactly once.
  *
  * Batch decomposition into two deterministic operators:
  *   - [[enrichLatest]]: every left record joins the right side's
  *     CURRENT (latest) value for its key — the steady-state semantics.
  *   - [[sequenceJoin]]: the exact consume-once buffer pairing — the
  *     i-th left record of a key pairs with the i-th right record of
  *     that key (arrival order), unpaired records drop out.
  */
object Joins {

  /** Left enrichment against the right side reduced to latest-per-key.
    * The reduction happens BEFORE the join, so the join input is
    * O(distinct right keys); when that is small (a dimension table or a
    * feature table with bounded key space) Spark broadcasts it and the
    * join costs zero shuffles on the big side.
    */
  def enrichLatest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      rightOrd: Column,
      broadcastRight: Boolean = true
  ): DataFrame = {
    val latestRight = Upsert.latest(right, rightKey, rightOrd)
    val r = if (broadcastRight) broadcast(latestRight) else latestRight
    left.join(r, left(leftKey) === r(rightKey), "left")
  }

  /** Plain keyed left join against a dimension table (right side already
    * one-row-per-key). Small dim → broadcast hash join.
    */
  def dimLeftJoin(left: DataFrame, dim: DataFrame, leftKey: String, dimKey: String): DataFrame =
    left.join(broadcast(dim), left(leftKey) === dim(dimKey), "left")

  /** Exact consume-once pairing (ralf/operators/join.py:35-56): left
    * records buffer per key; each arriving right record consumes the
    * oldest buffered left. In arrival order this pairs the i-th left
    * with the i-th right of each key. Implemented as row_number on both
    * sides + equi-join on (key, rn) — two hash-partition shuffles on the
    * same key, which Catalyst co-locates (the second exchange is reused).
    */
  def sequenceJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftOrd: String,
      rightOrd: String,
      leftPrefix: String = "l_",
      rightPrefix: String = "r_"
  ): DataFrame = {
    def number(df: DataFrame, ord: String, prefix: String): DataFrame = {
      val renamed = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, prefix + c))
      renamed.withColumn("_seq", row_number().over(
        Window.partitionBy(col(prefix + key)).orderBy(col(prefix + ord))
      ))
    }
    val l = number(left, leftOrd, leftPrefix)
    val r = number(right, rightOrd, rightPrefix)
    l.join(
      r,
      l(leftPrefix + key) === r(rightPrefix + key) && l("_seq") === r("_seq"),
      "inner"
    ).drop(r(rightPrefix + key)).drop(r("_seq"))
  }
}
