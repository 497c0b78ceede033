package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count-based per-key windows (the only window kind the reference has:
  * ralf/operators/window.py:14-124 — no time/session windows, see
  * SURVEY.md §2.4).
  *
  * Both operators need a total per-key order; the caller supplies a
  * unique, monotone `ord` column. Physical shape: one hash-partition
  * shuffle on the key + an in-partition sort (Spark's WindowExec). At
  * scale, skewed keys are the hazard — a single key's history must fit
  * one task. Mitigations documented per method.
  */
object Windows {

  private def rn(key: String, ord: Column): Column =
    row_number().over(Window.partitionBy(col(key)).orderBy(ord))

  /** Per-key count-based tumbling window of `size` records
    * (ralf/operators/window.py:14-51): buffer until `size` records
    * arrive, emit, reset. Batch formulation: bucket = (rn-1)/size;
    * only complete buckets are emitted (the reference never emits a
    * partial buffer).
    *
    * Output: key, window_id, the aggregates over the bucket, plus the
    * windowed values as an order-preserved array (mirrors ralf's
    * `window: List[Record]` column).
    */
  def tumbling(df: DataFrame, key: String, ord: Column, valueCol: Column, size: Int): DataFrame = {
    require(size > 0, "window size must be positive")
    df.withColumn("_rn", rn(key, ord))
      .withColumn("window_id", ((col("_rn") - 1) / size).cast("long"))
      .groupBy(col(key), col("window_id"))
      .agg(
        count(lit(1)).as("n"),
        // sort_array(collect_list(struct(ord, v))) → deterministic order
        transform(
          sort_array(collect_list(struct(col("_rn").as("o"), valueCol.as("v")))),
          e => e.getField("v")
        ).as("window_values"),
        min(ord).as("first_ord"),
        max(ord).as("last_ord")
      )
      .filter(col("n") === size)
      .drop("n")
  }

  /** Per-key count-based sliding window (ralf/operators/window.py:54-124):
    * emit the last `windowSize` records every `slideSize` records, i.e.
    * at rows where rn >= w and (rn - w) % s == 0. The emitted record
    * carries aggregates over the trailing window; `complete_time` /
    * `create_time` semantics collapse to the order column in batch.
    *
    * `rowsBetween(-(w-1), 0)` keeps the frame bounded — Spark's window
    * frame buffer holds at most `w` rows per task regardless of key
    * history length, so this survives 100× scale-up as long as a single
    * key's rows fit a partition (salting is the remedy for pathological
    * hot keys; not needed for this corpus).
    */
  def sliding(
      df: DataFrame,
      key: String,
      ord: Column,
      valueCol: Column,
      windowSize: Int,
      slideSize: Int
  ): DataFrame = {
    require(windowSize > 0 && slideSize > 0)
    val byKey = Window.partitionBy(col(key)).orderBy(ord)
    val frame = byKey.rowsBetween(-(windowSize - 1), 0)
    df.withColumn("_rn", row_number().over(byKey))
      .withColumn("w_avg", avg(valueCol).over(frame))
      .withColumn("w_sum", sum(valueCol).over(frame))
      .withColumn("w_min", min(valueCol).over(frame))
      .withColumn("w_max", max(valueCol).over(frame))
      .filter(col("_rn") >= windowSize && ((col("_rn") - windowSize) % slideSize) === 0)
  }

  /** Sliding window with a per-key slide size supplied as a plan table
    * (ralf/operators/window.py:88-100: per-key adaptive slide from a
    * JSON plan file). `plan` has columns (key, slide); keys absent from
    * the plan fall back to `defaultSlide`. The plan is tiny → broadcast
    * join, no extra shuffle.
    */
  def slidingPerKeyPlan(
      df: DataFrame,
      key: String,
      ord: Column,
      valueCol: Column,
      windowSize: Int,
      plan: DataFrame,
      defaultSlide: Int
  ): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(ord)
    val frame = byKey.rowsBetween(-(windowSize - 1), 0)
    df.join(broadcast(plan), Seq(key), "left")
      .withColumn("_slide", coalesce(col("slide"), lit(defaultSlide)))
      .withColumn("_rn", row_number().over(byKey))
      .withColumn("w_avg", avg(valueCol).over(frame))
      .filter(col("_rn") >= windowSize && ((col("_rn") - windowSize) % col("_slide")) === 0)
      .drop("slide")
  }

  /** Running per-key fold (v2 `Sum` transform,
    * ralf/v2/examples/counter.py:56-65): cumulative aggregate in event
    * order — `sum(...) over (partition by key order by ord rows
    * unbounded preceding)`.
    */
  def runningSum(df: DataFrame, key: String, ord: Column, valueCol: Column): DataFrame = {
    val frame = Window.partitionBy(col(key)).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("running_sum", sum(valueCol).over(frame))
      .withColumn("running_count", count(lit(1)).over(frame))
  }

  /** Gap-based sessionization: a new session starts when the gap to the
    * key's previous event exceeds `maxGap` (in `ord` units). session_id
    * = running count of session starts per key — the classic
    * lag + cumulative-sum formulation, one shuffle + in-partition sort.
    */
  def sessionize(df: DataFrame, key: String, ord: Column, maxGap: Long): DataFrame = {
    val byKey = Window.partitionBy(col(key)).orderBy(ord)
    val prev = lag(ord, 1).over(byKey)
    val isStart = when(prev.isNull || ord - prev > maxGap, 1L).otherwise(0L)
    df.withColumn(
      "session_id",
      sum(isStart).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1
    )
  }
}
