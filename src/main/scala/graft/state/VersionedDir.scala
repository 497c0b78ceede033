package graft.state

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Atomically-versioned parquet directory: writers publish `v*` dirs and
  * swap a `_CURRENT` pointer; readers resolve the pointer (falling back
  * to the newest committed version if a swap is mid-flight) and never
  * observe a partial write. Shared by the streaming FeatureTableSink and
  * the batch ParquetConnector.
  */
object VersionedDir {

  def versionOf(name: String): Option[Long] =
    if (name.startsWith("v") && name.drop(1).forall(_.isDigit)) Some(name.drop(1).toLong)
    else None

  def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Current version dir: the `_CURRENT` pointer, falling back to the
    * highest committed `v*` directory if the pointer is mid-swap or was
    * lost — a reader never observes an empty table once one exists.
    */
  def currentVersion(fs: FileSystem, root: Path): Option[Path] = {
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
      else committedVersions(fs, root).lastOption
    }
  }

  /** All committed `v*` dirs, ascending by version. */
  def committedVersions(fs: FileSystem, root: Path): Seq[Path] =
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && versionOf(s.getPath.getName).isDefined &&
        fs.exists(new Path(s.getPath, "_SUCCESS")))
      .sortBy(s => versionOf(s.getPath.getName).get)
      .map(_.getPath)

  /** Read the current version (None if never written). */
  def read(spark: SparkSession, root: String): Option[DataFrame] = {
    val rootPath = new Path(root)
    currentVersion(fs(spark, root), rootPath).map(v => spark.read.parquet(v.toString))
  }

  /** Write `df` as a NEW version strictly above the current one (and at
    * least `minVersion`), swap the pointer, and prune superseded version
    * dirs down to the newest `keepVersions` — without pruning, a
    * long-running stream grows storage without bound and the fallback
    * listStatus scan slows with every batch. `keepVersions` >= 2 leaves
    * the previous version for readers that resolved the pointer just
    * before the swap.
    */
  def publish(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      minVersion: Long = 0L,
      keepVersions: Int = 2
  ): Long = {
    val rootPath = new Path(root)
    val hfs = fs(spark, root)
    val cur = currentVersion(hfs, rootPath)
    val nextV = math.max(cur.flatMap(p => versionOf(p.getName)).getOrElse(-1L) + 1, minVersion)
    val vDir = f"v$nextV%020d"
    df.write.mode(SaveMode.Overwrite).parquet(new Path(rootPath, vDir).toString)
    // pointer swap; read() falls back to the newest committed v* dir if
    // a reader lands inside the delete/rename window
    val tmp = new Path(rootPath, s"_CURRENT.tmp$nextV")
    val out = hfs.create(tmp, true)
    try out.write(vDir.getBytes("UTF-8")) finally out.close()
    val ptr = new Path(rootPath, "_CURRENT")
    hfs.delete(ptr, false)
    hfs.rename(tmp, ptr)
    if (keepVersions > 0) {
      val committed = committedVersions(hfs, rootPath)
      committed.dropRight(keepVersions).foreach(p => hfs.delete(p, true))
    }
    nextV
  }

  /** Read a SPECIFIC committed version (None if absent/uncommitted) —
    * the time-travel read under [[diffVersions]] and rollback audits.
    */
  def readVersion(spark: SparkSession, root: String, version: Long): Option[DataFrame] = {
    val hfs = fs(spark, root)
    committedVersions(hfs, new Path(root))
      .find(p => versionOf(p.getName).contains(version))
      .map(p => spark.read.parquet(p.toString))
  }

  /** Snapshot diff between two committed versions: one row per key
    * present in either, with `status` added / removed / changed /
    * unchanged — the audit a feature-store publish runs before trusting
    * a swap ("this batch touched 0.1% of keys, not 90%"). Row equality
    * is a deterministic fingerprint (xxhash64 over the non-key columns
    * in sorted-name order) computed scan-side, so the full-outer join
    * carries (key, one long) per side, never the rows themselves.
    */
  def diffVersions(
      spark: SparkSession,
      root: String,
      oldVersion: Long,
      newVersion: Long,
      keyCol: String
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    def keyed(v: Long, fpName: String): DataFrame = {
      val df = readVersion(spark, root, v).getOrElse(
        throw new IllegalArgumentException(s"version $v not committed under $root"))
      val rest = df.columns.filterNot(_ == keyCol).sorted.map(col)
      df.select(col(keyCol).as("key"), xxhash64(rest: _*).as(fpName))
    }
    keyed(oldVersion, "fp_old").join(keyed(newVersion, "fp_new"), Seq("key"), "full_outer")
      .select(col("key"),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }
}
