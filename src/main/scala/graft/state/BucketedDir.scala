package graft.state

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Names

/** Hash-bucketed versioned parquet table: `root/bNNNNN/` holds one
  * [[VersionedDir]] per key-hash bucket, so a merge rewrites ONLY the
  * buckets that contain batch keys — O(batch-coverage) write cost per
  * merge instead of the O(table) full rewrite of a single flat
  * VersionedDir. This is the at-scale analog of the reference's
  * per-record upserts (ralf/state/sqlite_connector.py:30-38): at 100 TB
  * a feature table absorbing small update batches must not
  * re-materialize the world every micro-batch.
  *
  * Consistency: each bucket publish is an atomic pointer swap, so a
  * reader sees every bucket at some committed version — but a
  * multi-bucket merge is not a cross-bucket snapshot (bucket A may be
  * post-merge while B is still pre-merge for a concurrently-resolving
  * reader). That matches the reference's granularity: its connectors
  * upsert record-at-a-time with no cross-record transaction.
  *
  * The bucket count is pinned at table creation in a `_BUCKETS` file —
  * keys are routed by `pmod(xxhash64(key), numBuckets)`, so changing the
  * count would strand stale rows in their old buckets. Re-bucketing
  * requires a full rewrite ([[merge]] refuses a mismatched count).
  */
object BucketedDir {

  def bucketName(b: Int): String = f"b$b%05d"

  /** Bucket id of a key — computed with a Spark expression (never
    * driver-side) so routing is identical everywhere. `xxhash64(null)`
    * is the seed constant, so null keys route to a fixed bucket.
    */
  def bucketCol(keyCol: String, numBuckets: Int): Column =
    pmod(xxhash64(col(keyCol)), lit(numBuckets.toLong)).cast("int")

  /** The table's pinned bucket count (None if never written). */
  def bucketCount(spark: SparkSession, root: String): Option[Int] = {
    val hfs = VersionedDir.fs(spark, root)
    val f = new Path(new Path(root), "_BUCKETS")
    if (!hfs.exists(f)) None
    else {
      val in = hfs.open(f)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt)
      finally in.close()
    }
  }

  private def pinBucketCount(spark: SparkSession, root: String, numBuckets: Int): Int =
    bucketCount(spark, root) match {
      case Some(stored) =>
        require(stored == numBuckets,
          s"table at $root was created with $stored buckets, merge requested $numBuckets; " +
            "re-bucketing requires a full rewrite")
        stored
      case None =>
        val hfs = VersionedDir.fs(spark, root)
        hfs.mkdirs(new Path(root))
        val out = hfs.create(new Path(new Path(root), "_BUCKETS"), true)
        try out.write(numBuckets.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
        numBuckets
    }

  /** Read the current table: ONE parquet scan over every bucket's
    * current version dir (None if never written). The bucket count is
    * not needed to read.
    */
  def read(spark: SparkSession, root: String): Option[DataFrame] = {
    val rootPath = new Path(root)
    val hfs = VersionedDir.fs(spark, root)
    if (!hfs.exists(rootPath)) None
    else {
      val paths = hfs.listStatus(rootPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.matches("b\\d+"))
        .sortBy(_.getPath.getName)
        .flatMap(s => VersionedDir.currentVersion(hfs, s.getPath))
        .map(_.toString)
      if (paths.isEmpty) None else Some(spark.read.parquet(paths: _*))
    }
  }

  /** Read ONE bucket's current version (None if that bucket was never
    * written) — the point-query path: a key's row can only live in its
    * hash bucket, so a lookup scans 1/numBuckets of the table (plus the
    * key predicate pushed into that bucket's parquet scan).
    */
  def readBucket(spark: SparkSession, root: String, bucket: Int): Option[DataFrame] =
    VersionedDir.read(spark, new Path(new Path(root), bucketName(bucket)).toString)

  /** The bucket a key value routes to, using the table's pinned count
    * and the SAME Spark expression as writes (`keyType` must be the
    * stored key column's type — xxhash64 of an int and a long differ).
    * None if the table was never written.
    */
  def bucketForKey(
      spark: SparkSession,
      root: String,
      key: Any,
      keyType: org.apache.spark.sql.types.DataType
  ): Option[Int] =
    bucketCount(spark, root).map { nb =>
      spark.range(1)
        .select(pmod(xxhash64(lit(key).cast(keyType)), lit(nb.toLong)).cast("int").as("b"))
        .head().getInt(0)
    }

  /** Merge a keyed batch, rewriting only the buckets its keys hash
    * into. For each touched bucket, `mergeFn(existingBucketRows,
    * batchRowsForBucket)` produces the bucket's new contents, published
    * strictly above the bucket's current version (and `minVersion` —
    * replay protection, see [[VersionedDir.publish]]). Untouched
    * buckets' files are not rewritten (byte-identical across the merge;
    * BucketedSinkSpec pins this).
    *
    * Returns the touched bucket ids. The touched set is a <=numBuckets
    * driver-side collect — control-plane sized by construction.
    */
  def merge(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      keyCol: String,
      numBuckets: Int,
      minVersion: Long = 0L,
      keepVersions: Int = 2
  )(mergeFn: (Option[DataFrame], DataFrame) => DataFrame): Seq[Int] = {
    val nb = pinBucketCount(spark, root, numBuckets)
    val bkt = Names.fresh(batch.columns.toSeq, "_bkt")
    // Materialize the batch once; each touched bucket then filters the
    // checkpointed blocks instead of recomputing the batch plan.
    val withB = batch.withColumn(bkt, bucketCol(keyCol, nb)).localCheckpoint(true)
    val touched = withB.select(bkt).distinct().collect().map(_.getInt(0)).sorted.toSeq
    touched.foreach { b =>
      val bRoot = new Path(new Path(root), bucketName(b)).toString
      val existing = VersionedDir.read(spark, bRoot)
      val part = withB.filter(col(bkt) === lit(b)).drop(bkt)
      VersionedDir.publish(spark, bRoot, mergeFn(existing, part), minVersion, keepVersions)
    }
    touched
  }
}
