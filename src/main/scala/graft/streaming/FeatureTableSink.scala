package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.state.VersionedDir
import graft.streaming.StreamingFeatures.KeyFeature

/** Durable feature-table sink: the parquet analog of ralf's storage
  * connectors (dict/SQLite/Redis, ralf/state/connector.py:7-30) — a
  * materialized latest-value-per-key table that consumers point-query
  * with a plain filtered scan.
  *
  * Each micro-batch merges the incoming per-key updates into the stored
  * table (union → max_by per key) and publishes through
  * [[graft.state.VersionedDir]]: a versioned directory plus an atomic
  * `_CURRENT` pointer swap, superseded versions pruned — readers never
  * see a partial write and storage stays bounded over a long-running
  * stream. At scale the same loop writes a partitioned/bucketed table
  * (or a lakehouse table with real MERGE); the plan shape is identical.
  */
object FeatureTableSink {

  /** Read the current materialized table (empty if never written). */
  def read(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    VersionedDir.read(spark, root).getOrElse(Seq.empty[KeyFeature].toDF())
  }

  /** Merge one batch of updates into the stored table. Exposed for
    * batch-mode backfills; the streaming sink calls this per
    * micro-batch.
    */
  def merge(spark: SparkSession, root: String, batch: Dataset[KeyFeature], version: Long): Unit = {
    val existing = read(spark, root)
    // Winner per key: highest event order (ord), numUpdates only as a
    // tie-break for re-emissions of the same ord. Never numUpdates
    // alone — the TTL path in latestPerKey resets that counter, and a
    // stale high count must not shadow fresh data.
    val merged = existing.unionByName(batch.toDF())
      .groupBy(col("key"))
      .agg(max_by(
        struct(col("ord"), col("value"), col("numUpdates")),
        struct(col("ord"), col("numUpdates"))).as("_cur"))
      .select(col("key"), col("_cur.ord").as("ord"), col("_cur.value").as("value"),
        col("_cur.numUpdates").as("numUpdates"))
    // Publish strictly above the current version (and at least the
    // micro-batch id) — a replayed micro-batch id (restart before offset
    // commit) must never overwrite the directory `existing` is lazily
    // scanning. keepVersions=2 leaves the just-superseded version for
    // in-flight readers.
    VersionedDir.publish(spark, root, merged, minVersion = version, keepVersions = 2)
    ()
  }

  /** Attach the sink to a stream of KeyFeature updates. */
  def start(
      spark: SparkSession,
      updates: Dataset[KeyFeature],
      root: String,
      availableNow: Boolean = true
  ): StreamingQuery = {
    val w = updates.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[KeyFeature], id: Long) =>
        merge(spark, root, batch, id)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Point query over the materialized table (SURVEY §2.1 #13). */
  def pointQuery(spark: SparkSession, root: String, key: String): DataFrame =
    read(spark, root).filter(col("key") === key)
}
