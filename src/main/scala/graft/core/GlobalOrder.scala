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

  /** [[withPrefixes]] result: `totalSums(i)` is the grand total of the
    * i-th sum column, in caller order.
    */
  final case class PrefixedN(df: DataFrame, totalRows: Long, totalSums: Seq[Long])

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
    val p = withPrefixes(df, sortCols, Seq(sumCol -> cumName), rankName)
    Prefixed(p.df, p.totalRows, p.totalSums.head)
  }

  /** [[withPrefix]] for SEVERAL long sum columns sharing one total
    * order — ONE range shuffle, one sort, one stats collect, one
    * WindowExec pass for all of them (the two-sided cumulative a
    * KS-style drift test needs would otherwise pay the sort twice).
    */
  def withPrefixes(
      df: DataFrame,
      sortCols: Seq[Column],
      sums: Seq[(Column, String)],
      rankName: String
  ): PrefixedN = {
    require(sums.nonEmpty, "withPrefixes needs at least one sum column")
    val cumNames = sums.map(_._2)
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1)
    var taken = df.columns.toSeq ++ cumNames :+ rankName
    def freshName(base: String): String = {
      val n = Names.fresh(taken, base); taken = taken :+ n; n
    }
    val pid = freshName("_pid")
    val svs = sums.indices.map(i => freshName(if (i == 0) "_sv" else s"_sv$i"))
    val sorted = sums.zip(svs)
      .foldLeft(df) { case (d, ((c, _), sv)) => d.withColumn(sv, c) }
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn(pid, spark_partition_id())
      .localCheckpoint(false)
    val stats = sorted.groupBy(col(pid))
      .agg(count(lit(1)).as("n"),
        svs.map(sv => coalesce(sum(col(sv)), lit(0L)).as(s"t$sv")): _*)
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), svs.indices.map(i => r.getLong(2 + i)))))
      .toMap
    val zero = (0L, svs.indices.map(_ => 0L))
    val offsetRows = (0 until parts).map { p =>
      val prior = (0 until p).map(q => stats.getOrElse(q, zero))
      Row((p +: (prior.map(_._1).sum +: svs.indices.map(i => prior.map(_._2(i)).sum))): _*)
    }
    val nOff = freshName("_n_off")
    val cOffs = svs.indices.map(i => freshName(s"_c_off$i"))
    // explicit-schema createDataFrame (repo invariant: no case-class
    // toDF for driver-side constants — REPL encoders can't derive)
    val offsets = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(offsetRows: _*),
      StructType(
        StructField(pid, IntegerType, nullable = false) +:
        StructField(nOff, LongType, nullable = false) +:
        cOffs.map(c => StructField(c, LongType, nullable = false))))
    val w = Window.partitionBy(col(pid)).orderBy(sortCols: _*)
    val out = cumNames.zip(svs).zip(cOffs)
      .foldLeft(sorted.join(broadcast(offsets), Seq(pid))) {
        case (d, ((cum, sv), cOff)) => d.withColumn(cum, sum(col(sv)).over(w) + col(cOff))
      }
      .withColumn(rankName, row_number().over(w).cast("long") + col(nOff))
      .drop((pid +: nOff +: (svs ++ cOffs)): _*)
    PrefixedN(out, stats.values.map(_._1).sum,
      svs.indices.map(i => stats.values.map(_._2(i)).sum))
  }
}
