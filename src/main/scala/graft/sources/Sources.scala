package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources (SURVEY.md §2.1 #6-10). The reference's sources are pull
  * loops that pace synthetic or replayed records into the DAG; in batch
  * Spark a source is just a DataFrame, and pacing (`send_rate`) only
  * matters for scheduling experiments, not results.
  */
object Sources {

  /** `CounterSource` (ralf/v2/tests/test_api.py:18-32): emits 1..n. */
  def counter(spark: SparkSession, n: Long): DataFrame =
    spark.range(1, n + 1).toDF("value")

  /** `FakeReader` (ralf/operators/source.py:90-135): for each of
    * `timesteps` iterations emit value=1 for each of `numKeys` keys.
    * Batch: a range × range grid — distributed generation, no driver
    * loop; `spark.range` parallelizes across executors.
    */
  def fakeReader(spark: SparkSession, numKeys: Int, timesteps: Int): DataFrame = {
    val steps = spark.range(0, timesteps.toLong).toDF("timestep")
    val keys = spark.range(0, numKeys.toLong).select(col("id").cast("string").as("key"))
    steps.crossJoin(broadcast(keys))
      .select(
        col("key"),
        lit(1.0).as("value"),
        col("timestep").as("timestamp"),
        (col("timestep") * numKeys + col("key").cast("long")).as("seq")
      )
  }

  /** `FileReader` (ralf/operators/source.py:138-198): CSV replay with
    * optional key fan-out (each row duplicated to `numKeys` key streams).
    */
  def fileReader(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      numKeys: Int = 0
  ): DataFrame = {
    val base = schema match {
      case Some(s) => spark.read.schema(s).option("header", "true").csv(path)
      case None    => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    }
    if (numKeys <= 0) base
    else {
      val keys = spark.range(0, numKeys.toLong).select(col("id").cast("string").as("key"))
      base.crossJoin(broadcast(keys))
    }
  }

  /** Parquet feature source — the batch ingest path for everything in
    * /root/testdata. Column pruning + predicate pushdown reach the scan.
    */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** `KafkaSource` (ralf/operators/source.py:55-87): streaming ingest.
    * Returns an unstarted streaming DataFrame with the reference's
    * record shape (key/value/timestamp columns from the Kafka message).
    * Requires the kafka connector on the classpath and a live broker —
    * construction only, used by streaming pipelines.
    */
  def kafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .load()
      .select(
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("timestamp").as("timestamp")
      )

  /** Rate source: the streaming analog of FakeReader — `rowsPerSecond`
    * records/sec with `key = value % numKeys` (SURVEY.md §2.1 #8).
    */
  def rate(spark: SparkSession, rowsPerSecond: Int, numKeys: Int): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toLong)
      .load()
      .select(
        (col("value") % numKeys).cast("string").as("key"),
        lit(1.0).as("value"),
        col("timestamp"),
        col("value").as("seq")
      )
}
