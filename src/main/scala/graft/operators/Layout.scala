package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional write layout: Z-order (Morton) clustering, the
  * standard data-skipping layout for tables filtered on MORE THAN ONE
  * column. Range-partitioning on a single column gives perfect
  * min/max pruning on that column and none on any other; interleaving
  * the bits of two columns into one ordinal and range-partitioning on
  * THAT bounds every aligned z-range in BOTH dimensions at once — each
  * written file carries tight min/max on both columns, so a scan
  * filtered on either (or both) skips most files.
  *
  * Everything here is exact long bit arithmetic (an unrolled
  * fixed-size expression tree — codegen'd, no HOF lambda, no UDF), so
  * the layout is deterministic and the oracle replays it with plain
  * integer shifts.
  */
object Layout {

  /** Morton interleave of the low `bits` of two non-negative longs:
    * bit i of `x` lands at position 2i, bit i of `y` at 2i+1. Inputs
    * are masked to `bits`, so callers quantize (mask / bucket / mod)
    * wider domains first. `bits` <= 31 keeps the z-value in a long.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Cluster `df` for writing: range-partition + in-partition sort on
    * the z-value of (`xCol`, `yCol`). Each output partition (= written
    * file) covers a contiguous z-range, hence a bounded rectangle in
    * (x, y) — the layout a downstream reader's min/max pruning feeds
    * on. The z column is dropped; the layout lives in the row order.
    */
  def zorderLayout(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      numPartitions: Int
  ): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    val z = graft.core.Names.fresh(df.columns.toSeq, "_z")
    df.withColumn(z, zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }

  /** The skipping audit: bucket rows by the top bits of their z-value
    * (an aligned z-range of size 2^(2·`level`)) and report each
    * bucket's row count and min/max of BOTH dimensions. On a Z-curve,
    * an aligned bucket's x-span and y-span are each < 2^`level` —
    * uniformly bounded however the data is distributed — which is the
    * file-level min/max tightness a z-ordered write hands to partition
    * pruning. Deterministic integer output, oracle-replayable.
    */
  def zorderStats(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      level: Int
  ): DataFrame = {
    require(level > 0 && level <= bits, s"level must be in [1, bits], got $level")
    val mask = lit((1L << bits) - 1L)
    val xm = col(xCol).cast("long").bitwiseAND(mask)
    val ym = col(yCol).cast("long").bitwiseAND(mask)
    df.select(xm.as("x"), ym.as("y"),
        shiftright(zValue(xm, ym, bits), 2 * level).as("zbucket"))
      .groupBy(col("zbucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }
}
