package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.state.{BucketedDir, VersionedDir}
import graft.streaming.StreamingFeatures.{KeyEvent, KeyFeature}

/** Durable feature-table sink: the parquet analog of ralf's storage
  * connectors (dict/SQLite/Redis, ralf/state/connector.py:7-30) — a
  * materialized latest-value-per-key table that consumers point-query
  * with a plain filtered scan.
  *
  * Each micro-batch merges the incoming per-key updates into the stored
  * table through [[graft.state.BucketedDir]]: the table is hash-bucketed
  * by key and a batch rewrites ONLY the buckets its keys land in (union
  * → max_by per key, per touched bucket), each bucket published with an
  * atomic `_CURRENT` pointer swap and superseded versions pruned.
  * Readers never see a partial write, storage stays bounded over a
  * long-running stream, and — the 100 TB property — write cost per
  * micro-batch is O(touched buckets), not O(table): a small batch into a
  * huge table no longer re-materializes the world.
  *
  * `keepVersions` bounds reader staleness: a reader that resolved a
  * bucket's pointer survives `keepVersions - 1` subsequent publishes of
  * that bucket before its version dir is pruned mid-scan. Long-scanning
  * concurrent readers of a hot table should raise it.
  */
object FeatureTableSink {

  /** Default bucket count — sized for test-scale tables; a real 100 TB
    * deployment picks numBuckets ~ table-size / target-file-size.
    */
  val DefaultBuckets = 16

  /** Read the current materialized table (empty if never written).
    * Falls back to a flat [[VersionedDir]] layout for tables written by
    * pre-bucketed versions of this sink; the first bucketed [[merge]]
    * into such a root migrates the flat rows into buckets (BucketedDir's
    * flat-layout seeding), so the fallback never shadows live data.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    BucketedDir.read(spark, root)
      .orElse(VersionedDir.read(spark, root))
      .getOrElse(Seq.empty[KeyFeature].toDF())
  }

  /** Merge one batch of updates into the stored table. Exposed for
    * batch-mode backfills; the streaming sink calls this per
    * micro-batch.
    */
  def merge(
      spark: SparkSession,
      root: String,
      batch: Dataset[KeyFeature],
      version: Long,
      numBuckets: Int = DefaultBuckets,
      keepVersions: Int = 2
  ): Unit = {
    // Publish each touched bucket strictly above its current version
    // (and at least the micro-batch id) — a replayed micro-batch id
    // (restart before offset commit) must never overwrite the directory
    // a reader is lazily scanning.
    BucketedDir.merge(spark, root, batch.toDF(), "key", numBuckets,
      minVersion = version, keepVersions = keepVersions) { (existing, part) =>
      // Winner per key: highest event order (ord), numUpdates only as a
      // tie-break for re-emissions of the same ord. Never numUpdates
      // alone — the TTL path in latestPerKey resets that counter, and a
      // stale high count must not shadow fresh data.
      existing.map(_.unionByName(part)).getOrElse(part)
        .groupBy(col("key"))
        .agg(max_by(
          struct(col("ord"), col("value"), col("numUpdates")),
          struct(col("ord"), col("numUpdates"))).as("_cur"))
        .select(col("key"), col("_cur.ord").as("ord"), col("_cur.value").as("value"),
          col("_cur.numUpdates").as("numUpdates"))
    }
    ()
  }

  /** Merge a batch of [[KeyEvent]]s — the sink side of the eviction
    * cascade (ralf/operator.py:248-262): a key whose LAST event in the
    * batch is a tombstone is deleted from the stored table; other keys
    * merge latest-wins as in [[merge]]. "Last" is by (ord, evicted):
    * an update and its eviction at the same ord resolve to the
    * eviction, matching the operator's processing order.
    */
  def mergeEvents(
      spark: SparkSession,
      root: String,
      batch: Dataset[KeyEvent],
      version: Long,
      numBuckets: Int = DefaultBuckets,
      keepVersions: Int = 2
  ): Unit = {
    // Reduce the batch to its last event per key BEFORE bucketing (by
    // (ord, evicted): an update and its eviction at the same ord resolve
    // to the eviction, matching the operator's processing order) — then
    // each touched bucket applies its deletes and upserts locally.
    val lastEvent = batch.toDF()
      .groupBy(col("key"))
      .agg(max_by(
        struct(col("ord"), col("value"), col("numUpdates"), col("evicted")),
        struct(col("ord"), col("evicted").cast("int"))).as("_e"))
      .select(col("key"), col("_e.ord").as("ord"), col("_e.value").as("value"),
        col("_e.numUpdates").as("numUpdates"), col("_e.evicted").as("evicted"))
    BucketedDir.merge(spark, root, lastEvent, "key", numBuckets,
      minVersion = version, keepVersions = keepVersions) { (existing, part) =>
      val evictedKeys = part.filter(col("evicted")).select("key")
      val ups = part.filter(!col("evicted")).drop("evicted")
      existing.map(_.join(broadcast(evictedKeys), Seq("key"), "left_anti")).getOrElse(ups.limit(0))
        .unionByName(ups)
        .groupBy(col("key"))
        .agg(max_by(
          struct(col("ord"), col("value"), col("numUpdates")),
          struct(col("ord"), col("numUpdates"))).as("_cur"))
        .select(col("key"), col("_cur.ord").as("ord"), col("_cur.value").as("value"),
          col("_cur.numUpdates").as("numUpdates"))
    }
    ()
  }

  /** Attach a stream of KeyEvents (updates + evictions) to the sink. */
  def startEvents(
      spark: SparkSession,
      events: Dataset[KeyEvent],
      root: String,
      availableNow: Boolean = true,
      numBuckets: Int = DefaultBuckets,
      keepVersions: Int = 2
  ): StreamingQuery = {
    val w = events.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[KeyEvent], id: Long) =>
        mergeEvents(spark, root, batch, id, numBuckets, keepVersions)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Attach the sink to a stream of KeyFeature updates. */
  def start(
      spark: SparkSession,
      updates: Dataset[KeyFeature],
      root: String,
      availableNow: Boolean = true,
      numBuckets: Int = DefaultBuckets,
      keepVersions: Int = 2
  ): StreamingQuery = {
    val w = updates.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[KeyFeature], id: Long) =>
        merge(spark, root, batch, id, numBuckets, keepVersions)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Point query over the materialized table (SURVEY §2.1 #13). */
  def pointQuery(spark: SparkSession, root: String, key: String): DataFrame =
    read(spark, root).filter(col("key") === key)
}
