package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: the Morton interleave must be exact bit arithmetic,
  * aligned z-buckets must bound BOTH dimensions, and the write helper
  * must preserve rows while clustering partitions.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("zValue: interleaves bits exactly (hand-computed cases)") {
    val df = Seq((5L, 3L), (0L, 0L), (7L, 0L), (0L, 7L), (1023L, 1023L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 10).as("z"))
    // x=101b at even positions, y=011b at odd: 1 + 2 + 8 + 16 = 27
    assert(df.as[Long].collect().toList ==
      List(27L, 0L, 21L, 42L, (1L << 20) - 1L))
  }

  test("zValue: masks inputs to the declared bit width") {
    val wide = Seq((1024L + 5L, 2048L + 3L)).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), 10).as("z"))
    assert(wide.as[Long].head() == 27L)
  }

  test("aligned z-buckets bound both dimensions within 2^level") {
    val pts = (0L until 4000L).map(i => ((i * 37L) % 1024L, (i * 101L) % 1024L))
      .toDF("x", "y")
    val level = 5
    val viol = Layout.zorderStats(pts, "x", "y", bits = 10, level = level)
      .filter(col("x_max") - col("x_min") >= (1L << level) ||
        col("y_max") - col("y_min") >= (1L << level))
      .count()
    assert(viol == 0, s"every aligned bucket must fit a ${1 << level}-rect")
  }

  test("zorderLayout: preserves rows, drops the z column, clusters partitions") {
    val pts = (0L until 2000L).map(i => ((i * 37L) % 1024L, (i * 101L) % 1024L))
      .toDF("x", "y")
    val laid = Layout.zorderLayout(pts, "x", "y", bits = 10, numPartitions = 8)
    assert(laid.columns.toSeq == Seq("x", "y"))
    assert(laid.count() == 2000L)
    // each range partition covers a contiguous z-interval: the average
    // per-partition y-span must beat single-column x-range layout,
    // where every partition sees ~the full y range
    def avgYSpan(df: org.apache.spark.sql.DataFrame): Double = {
      val spans = df.withColumn("pid", spark_partition_id())
        .groupBy("pid").agg((max("y") - min("y")).cast("double").as("s"))
        .select("s").as[Double].collect()
      spans.sum / spans.length
    }
    val xLaid = pts.repartitionByRange(8, col("x")).sortWithinPartitions(col("x"))
    assert(avgYSpan(laid) < avgYSpan(xLaid),
      "z-layout must bound the second dimension where x-range layout cannot")
  }
}
