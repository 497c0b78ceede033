package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write-time layout for co-located joins: a table bucketed (and
  * sorted) on its join/aggregation key is hash-pre-partitioned on disk,
  * so every future equi-join or aggregation on that key reads buckets
  * aligned 1:1 with tasks — no exchange on either pre-bucketed side.
  * At 100 TB this converts the recurring fact⋈fact shuffle (the
  * dominant cost of a feature-join pipeline) into a one-time write
  * layout decision; the bucket count is chosen once per table (a small
  * multiple of the cluster's parallelism).
  */
object Bucketing {

  /** Register `df` in the session catalog as a parquet table bucketed
    * by `bucketCol` into `numBuckets`, sorted within buckets for
    * merge-join readiness.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
