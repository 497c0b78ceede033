package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Exact global prefix sums and ranks WITHOUT a single-partition
  * window — the two-pass shape shared by [[graft.llm.Selection]]'s
  * budget cut / balanced sharding and [[graft.llm.Mixture]]'s UniMax
  * waterfill (factored here in round 7; it was triplicated, and
  * UniMax's variant was an O(slices²) triangle join).
  *
  * Pass 1: range-repartition on the sort order + in-partition sort,
  * then per-partition (row count, sum) totals to the driver — two
  * longs per partition, control-plane sized at any scale. Pass 2:
  * each partition's running window offsets by the totals of the
  * partitions ranked before it, joined back as a BROADCAST (never a
  * per-partition when-chain: a 100 TB sort spans thousands of range
  * partitions, and a thousand-branch conditional blows up codegen).
  *
  * Partition boundaries come from range sampling and are NOT
  * deterministic — but every row's global prefix/rank depends only on
  * the total sort order, so the RESULT is exact and
  * engine-reproducible (SelectionSpec pins equality with the naive
  * global window). The sorted intermediate rides a lazy
  * localCheckpoint so the partition ids the offsets were collected
  * from are the ones the final pass reads (and the heavy sort never
  * re-executes for the driver collect).
  */
object GlobalOrder {

  /** The prefixed frame plus its driver-side totals (free — the
    * per-partition stats are already collected for the offsets).
    */
  final case class Prefixed(df: DataFrame, totalRows: Long, totalSum: Long)

  /** `df` + `cumName` = the inclusive global prefix sum of `sumCol`
    * and `rankName` = the 1-based global rank, both over the
    * `sortCols` total order (callers make the order total — tie-break
    * by a unique id). `sumCol` must be long-typed: the prefix is exact
    * integer arithmetic end to end.
    */
  def withPrefix(
      df: DataFrame,
      sortCols: Seq[Column],
      sumCol: Column,
      cumName: String,
      rankName: String
  ): Prefixed = {
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    val pid = Names.fresh(df.columns.toSeq ++ Seq(cumName, rankName), "_pid")
    val sc = Names.fresh(df.columns.toSeq ++ Seq(cumName, rankName, pid), "_sv")
    val sorted = df
      .withColumn(sc, sumCol)
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn(pid, spark_partition_id())
      .localCheckpoint(false)
    val stats = sorted.groupBy(col(pid))
      .agg(count(lit(1)).as("n"), coalesce(sum(col(sc)), lit(0L)).as("t"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val offsetRows = (0 until parts).map { p =>
      val prior = (0 until p).map(q => stats.getOrElse(q, (0L, 0L)))
      Row(p, prior.map(_._1).sum, prior.map(_._2).sum)
    }
    val nOff = Names.fresh(df.columns.toSeq ++ Seq(cumName, rankName, pid, sc), "_n_off")
    val cOff = Names.fresh(df.columns.toSeq ++ Seq(cumName, rankName, pid, sc, nOff), "_c_off")
    // explicit-schema createDataFrame (repo invariant: no case-class
    // toDF for driver-side constants — REPL encoders can't derive)
    val offsets = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(offsetRows: _*),
      StructType(Seq(
        StructField(pid, IntegerType, nullable = false),
        StructField(nOff, LongType, nullable = false),
        StructField(cOff, LongType, nullable = false))))
    val w = Window.partitionBy(col(pid)).orderBy(sortCols: _*)
    val out = sorted.join(broadcast(offsets), Seq(pid))
      .withColumn(cumName, sum(col(sc)).over(w) + col(cOff))
      .withColumn(rankName, row_number().over(w).cast("long") + col(nOff))
      .drop(pid, sc, nOff, cOff)
    Prefixed(out, stats.values.map(_._1).sum, stats.values.map(_._2).sum)
  }
}
