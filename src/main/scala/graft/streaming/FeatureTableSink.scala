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

  private def currentPointer(fs: org.apache.hadoop.fs.FileSystem, root: Path): Option[Path] = {
    val ptr = new Path(root, "_CURRENT")
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val v = try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
      Some(new Path(root, v)).filter(fs.exists)
    }
  }

  /** Read the current materialized table (empty if never written). */
  def read(spark: SparkSession, root: String): DataFrame = {
    import spark.implicits._
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    currentPointer(fs, rootPath) match {
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
    val existing = read(spark, root)
    // Emissions are cumulative per-key state snapshots (numUpdates is a
    // running counter), so the newest snapshot — max numUpdates — wins.
    val merged = existing.unionByName(batch.toDF())
      .groupBy(col("key"))
      .agg(max_by(struct(col("ord"), col("value"), col("numUpdates")), col("numUpdates")).as("_cur"))
      .select(col("key"), col("_cur.ord").as("ord"), col("_cur.value").as("value"),
        col("_cur.numUpdates").as("numUpdates"))
    val vDir = f"v$version%020d"
    merged.write.mode(SaveMode.Overwrite).parquet(new Path(rootPath, vDir).toString)
    // atomic pointer swap: tmp file + rename
    val tmp = new Path(rootPath, s"_CURRENT.tmp$version")
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
