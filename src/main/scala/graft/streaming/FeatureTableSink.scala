package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}

import graft.streaming.StreamingFeatures.KeyFeature

/** Durable feature-table sink: the parquet analog of ralf's storage
  * connectors (dict/SQLite/Redis, ralf/state/connector.py:7-30) — a
  * materialized latest-value-per-key table that consumers point-query
  * with a plain filtered scan.
  *
  * Each micro-batch merges the incoming per-key updates into the stored
  * table (union → max_by per key) and atomically swaps a versioned
  * directory via a `_CURRENT` pointer — readers never see a partial
  * write. At scale the same loop writes a partitioned/bucketed table
  * (or a lakehouse table with real MERGE); the plan shape is identical.
  */
object FeatureTableSink {

  private def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.drop(1).forall(_.isDigit)) Some(name.drop(1).toLong)
    else None

  /** Current version dir: the `_CURRENT` pointer, falling back to the
    * highest committed `v*` directory if the pointer is mid-swap or was
    * lost — a reader never observes an empty table once one exists.
    */
  private def currentVersion(fs: org.apache.hadoop.fs.FileSystem, root: Path): Option[Path] = {
    val ptr = new Path(root, "_CURRENT")
    val fromPtr =
      if (!fs.exists(ptr)) None
      else {
        val in = fs.open(ptr)
        val v = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
        Some(new Path(root, v)).filter(fs.exists)
      }
    fromPtr.orElse {
      if (!fs.exists(root)) None
      else fs.listStatus(root).toSeq
        .filter(s => s.isDirectory && versionOf(s.getPath.getName).isDefined &&
          fs.exists(new Path(s.getPath, "_SUCCESS")))
        .sortBy(s => versionOf(s.getPath.getName).get)
        .lastOption.map(_.getPath)
    }
  }

  /** Read the current materialized table (empty if never written). */
  def read(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    currentVersion(fs, rootPath) match {
      case Some(v) => spark.read.parquet(v.toString)
      case None => Seq.empty[KeyFeature].toDF()
    }
  }

  /** Merge one batch of updates into the stored table. Exposed for
    * batch-mode backfills; the streaming sink calls this per
    * micro-batch.
    */
  def merge(spark: SparkSession, root: String, batch: Dataset[KeyFeature], version: Long): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = currentVersion(fs, rootPath)
    val existing = cur match {
      case Some(v) => spark.read.parquet(v.toString)
      case None => { import spark.implicits._; Seq.empty[KeyFeature].toDF() }
    }
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
    // Always write a NEW version dir strictly above the current one —
    // a replayed micro-batch id (restart before offset commit) must
    // never overwrite the directory `existing` is lazily scanning.
    val nextV = math.max(cur.flatMap(p => versionOf(p.getName)).getOrElse(-1L) + 1, version)
    val vDir = f"v$nextV%020d"
    merged.write.mode(SaveMode.Overwrite).parquet(new Path(rootPath, vDir).toString)
    // pointer swap; read() falls back to the newest committed v* dir if
    // a reader lands inside the delete/rename window
    val tmp = new Path(rootPath, s"_CURRENT.tmp$nextV")
    val out = fs.create(tmp, true)
    try out.write(vDir.getBytes("UTF-8")) finally out.close()
    val ptr = new Path(rootPath, "_CURRENT")
    fs.delete(ptr, false)
    fs.rename(tmp, ptr)
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
