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

  /** JSON-lines source — the interchange format LLM-corpus dumps ship
    * in (one JSON document per line). An explicit schema keeps the
    * read single-pass (inference scans the data twice) and pins column
    * types against drift across shards; pass None only for ad-hoc
    * exploration.
    */
  def jsonl(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None
  ): DataFrame = schema match {
    case Some(s) => spark.read.schema(s).json(path)
    case None    => spark.read.json(path)
  }

  /** Parquet feature source — the batch ingest path for everything in
    * /root/testdata. Column pruning + predicate pushdown reach the scan.
    */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** ORC source — the other columnar interchange format Spark ships
    * natively; same pruning/pushdown properties as [[parquet]].
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** The reference's Kafka record shape (ralf/operators/source.py:61-70):
    * a JSON message body carrying key / value / send_time / create_time.
    * [[decodeRecords]] turns the raw Kafka (key, value, timestamp)
    * columns into typed update records — factored out of [[kafka]] so
    * the parse logic is testable on static data without a broker.
    */
  val recordSchema: StructType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("send_time", org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("create_time", org.apache.spark.sql.types.DoubleType)))

  /** Decode raw (key: binary/string, value: binary/string JSON,
    * timestamp) message columns into the typed record shape. Malformed
    * messages yield null fields (PERMISSIVE) rather than failing the
    * stream — the reference's msgpack decode loop has the same
    * drop-don't-crash posture.
    */
  def decodeRecords(messages: DataFrame): DataFrame =
    messages.select(
      col("key").cast("string").as("msg_key"),
      from_json(col("value").cast("string"), recordSchema).as("r"),
      col("timestamp").as("kafka_time"))
      .select(
        coalesce(col("r.key"), col("msg_key")).as("key"),
        col("r.value").as("value"),
        col("r.send_time").as("send_time"),
        col("r.create_time").as("create_time"),
        col("kafka_time"))

  /** `KafkaSource` (ralf/operators/source.py:55-87): streaming ingest —
    * raw Kafka messages decoded through [[decodeRecords]]. Requires the
    * kafka connector on the classpath and a live broker; construction
    * only in this offline environment (the decode path is spec-tested
    * on static frames).
    */
  def kafka(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    decodeRecords(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .load())

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
