package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.state.VersionedDir
import graft.streaming.StreamingFeatures.{KeyEvent, KeyFeature}

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

  /** Merge a batch of [[KeyEvent]]s — the sink side of the eviction
    * cascade (ralf/operator.py:248-262): a key whose LAST event in the
    * batch is a tombstone is deleted from the stored table; other keys
    * merge latest-wins as in [[merge]]. "Last" is by (ord, evicted):
    * an update and its eviction at the same ord resolve to the
    * eviction, matching the operator's processing order.
    */
  def mergeEvents(spark: SparkSession, root: String, batch: Dataset[KeyEvent], version: Long): Unit = {
    val existing = read(spark, root)
    val lastEvent = batch.toDF()
      .groupBy(col("key"))
      .agg(max_by(
        struct(col("ord"), col("value"), col("numUpdates"), col("evicted")),
        struct(col("ord"), col("evicted").cast("int"))).as("_e"))
      .select(col("key"), col("_e.ord").as("ord"), col("_e.value").as("value"),
        col("_e.numUpdates").as("numUpdates"), col("_e.evicted").as("evicted"))
    val evictedKeys = lastEvent.filter(col("evicted")).select("key")
    val ups = lastEvent.filter(!col("evicted")).drop("evicted")
    val merged = existing.join(broadcast(evictedKeys), Seq("key"), "left_anti")
      .unionByName(ups)
      .groupBy(col("key"))
      .agg(max_by(
        struct(col("ord"), col("value"), col("numUpdates")),
        struct(col("ord"), col("numUpdates"))).as("_cur"))
      .select(col("key"), col("_cur.ord").as("ord"), col("_cur.value").as("value"),
        col("_cur.numUpdates").as("numUpdates"))
    VersionedDir.publish(spark, root, merged, minVersion = version, keepVersions = 2)
    ()
  }

  /** Attach a stream of KeyEvents (updates + evictions) to the sink. */
  def startEvents(
      spark: SparkSession,
      events: Dataset[KeyEvent],
      root: String,
      availableNow: Boolean = true
  ): StreamingQuery = {
    val w = events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[KeyEvent], id: Long) =>
        mergeEvents(spark, root, batch, id)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
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
