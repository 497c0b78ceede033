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

  /** Bucket id of a key — the single routing expression every write
    * uses. Point queries evaluate the SAME expression tree interpreted
    * on the driver ([[routeKey]]; BucketedSinkSpec pins the two equal
    * across key types). `xxhash64(null)` is the seed constant, so null
    * keys route to a fixed bucket.
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

  private def pinBucketCount(
      spark: SparkSession,
      root: String,
      keyCol: String,
      numBuckets: Int,
      keepVersions: Int,
      publishParallelism: Int
  ): Int =
    bucketCount(spark, root) match {
      case Some(stored) =>
        require(stored == numBuckets,
          s"table at $root was created with $stored buckets, merge requested $numBuckets; " +
            "re-bucketing requires a full rewrite")
        stored
      case None =>
        // First bucketed merge into this root. If a legacy FLAT
        // VersionedDir table lives here (pre-bucketed sink versions wrote
        // root/v*/ + root/_CURRENT), its rows must seed the buckets NOW:
        // once buckets exist, readers resolve them in preference to the
        // flat layout, so skipping this step would silently drop every
        // pre-existing row on the exact upgrade path read()'s fallback
        // claims to support (ADVICE r3). Migration runs BEFORE _BUCKETS
        // is written, so a crash mid-seed re-runs it on the next merge
        // (re-publishing a bucket just advances its version — idempotent).
        migrateFlatLayout(spark, root, keyCol, numBuckets, keepVersions, publishParallelism)
        val hfs = VersionedDir.fs(spark, root)
        hfs.mkdirs(new Path(root))
        val out = hfs.create(new Path(new Path(root), "_BUCKETS"), true)
        try out.write(numBuckets.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
        numBuckets
    }

  /** Seed buckets from a legacy flat [[VersionedDir]] at `root` (no-op
    * when none exists), then retire the flat `v*` dirs and `_CURRENT`
    * pointer. One O(table) rewrite at upgrade time — the documented
    * re-bucketing cost, paid once.
    */
  private def migrateFlatLayout(
      spark: SparkSession,
      root: String,
      keyCol: String,
      numBuckets: Int,
      keepVersions: Int,
      publishParallelism: Int
  ): Unit =
    VersionedDir.read(spark, root).foreach { flat =>
      // materialize off the flat files before they are deleted below
      publishPartitioned(spark, root, flat, keyCol, numBuckets,
        minVersion = 0L, keepVersions, publishParallelism)((_, part) => part)
      val hfs = VersionedDir.fs(spark, root)
      val rootPath = new Path(root)
      VersionedDir.committedVersions(hfs, rootPath).foreach(p => hfs.delete(p, true))
      hfs.delete(new Path(rootPath, "_CURRENT"), false)
      ()
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
    * and the SAME Catalyst expression tree as writes (`keyType` must be
    * the stored key column's type — xxhash64 of an int and a long
    * differ). None if the table was never written.
    *
    * Evaluated interpreted ON THE DRIVER — the write path's
    * `pmod(xxhash64(cast(key)), nb)` is a pure expression, so routing a
    * point query must not launch a one-row Spark job per HTTP hit
    * (ConnectorSpec pins driver-side ≡ write-path routing across key
    * types).
    */
  def bucketForKey(
      spark: SparkSession,
      root: String,
      key: Any,
      keyType: org.apache.spark.sql.types.DataType
  ): Option[Int] =
    bucketCount(spark, root).map(nb => routeKey(key, keyType, nb))

  /** Driver-side interpreted eval of the write-path routing expression
    * (`functions.xxhash64` is `XxHash64(_, seed = 42)`; `pmod` keeps the
    * result non-negative like the write side).
    */
  private[graft] def routeKey(key: Any, keyType: org.apache.spark.sql.types.DataType, nb: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal, Pmod, XxHash64}
    Pmod(new XxHash64(Seq(Cast(Literal(key), keyType, Some("UTC")))), Literal(nb.toLong))
      .eval(null).asInstanceOf[Long].toInt
  }

  /** Merge a keyed batch, rewriting only the buckets its keys hash
    * into. For each touched bucket, `mergeFn(existingBucketRows,
    * batchRowsForBucket)` produces the bucket's new contents, published
    * strictly above the bucket's current version (and `minVersion` —
    * replay protection, see [[VersionedDir.publish]]). Untouched
    * buckets' files are not rewritten (byte-identical across the merge;
    * BucketedSinkSpec pins this).
    *
    * Touched buckets publish CONCURRENTLY on a bounded driver-side
    * thread pool (`publishParallelism` at a time): each publish is an
    * independent Spark job against an independent directory, and Spark's
    * scheduler interleaves jobs submitted from multiple threads — a
    * sequential loop would serialize the per-bucket job latency exactly
    * when the table is large (a 100 TB table wants numBuckets in the
    * thousands: numBuckets ~ tableSize / targetBucketBytes with bucket
    * files at a few hundred MB, so merges touching many buckets are the
    * norm, not the exception). All publishes are awaited; the first
    * failure rethrows after the rest settle (buckets already published
    * stay published — same partial-progress semantics as the sequential
    * loop, and replays are version-guarded by `minVersion`).
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
      keepVersions: Int = 2,
      publishParallelism: Int = 8
  )(mergeFn: (Option[DataFrame], DataFrame) => DataFrame): Seq[Int] = {
    val nb = pinBucketCount(spark, root, keyCol, numBuckets, keepVersions, publishParallelism)
    publishPartitioned(spark, root, batch, keyCol, nb, minVersion, keepVersions,
      publishParallelism)(mergeFn)
  }

  /** The shared bucket-publish machinery behind [[merge]] and the
    * flat-layout migration: checkpoint the batch, route rows to buckets,
    * publish every touched bucket through the bounded pool.
    */
  private def publishPartitioned(
      spark: SparkSession,
      root: String,
      batch: DataFrame,
      keyCol: String,
      nb: Int,
      minVersion: Long,
      keepVersions: Int,
      publishParallelism: Int
  )(mergeFn: (Option[DataFrame], DataFrame) => DataFrame): Seq[Int] = {
    val bkt = Names.fresh(batch.columns.toSeq, "_bkt")
    // Materialize the batch once; each touched bucket then filters the
    // checkpointed blocks instead of recomputing the batch plan.
    val withB = batch.withColumn(bkt, bucketCol(keyCol, nb)).localCheckpoint(true)
    val touched = withB.select(bkt).distinct().collect().map(_.getInt(0)).sorted.toSeq
    def publishOne(b: Int): Unit = {
      val bRoot = new Path(new Path(root), bucketName(b)).toString
      val existing = VersionedDir.read(spark, bRoot)
      val part = withB.filter(col(bkt) === lit(b)).drop(bkt)
      VersionedDir.publish(spark, bRoot, mergeFn(existing, part), minVersion, keepVersions)
      ()
    }
    val par = math.max(1, math.min(publishParallelism, touched.size))
    if (par <= 1) touched.foreach(publishOne)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      try {
        // settle ALL futures (no fail-fast abandon: an abandoned publish
        // could still be mid-write when the caller retries), then rethrow
        // the first failure in bucket order
        val settled = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(
            touched.map(b => scala.concurrent.Future(publishOne(b)).transform(scala.util.Success(_)))),
          scala.concurrent.duration.Duration.Inf)
        settled.collectFirst { case scala.util.Failure(e) => throw e }
      } finally pool.shutdown()
    }
    touched
  }
}
