package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.state.{BucketedDir, BucketedParquetConnector}

/** The 100 TB sink property: a merge into a bucketed table rewrites ONLY
  * the buckets its batch keys hash into — every untouched bucket's files
  * stay byte-identical (VERDICT r2 "incremental sink merge"). Also pins
  * the bucket-count guard and the bucketed read path.
  */
class BucketedSinkSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("a", StringType, nullable = true)))

  private def df(rows: (Long, String)*) =
    spark.createDataFrame(rows.map(r => Row(r._1, r._2)).asJava, schema)

  private def tmp() = Files.createTempDirectory("graft-bktsink").toString

  /** Every file under each bucket dir: bucket -> sorted (relPath, md5). */
  private def snapshot(root: String): Map[String, Seq[(String, String)]] = {
    val rootP = Paths.get(root)
    Files.list(rootP).iterator().asScala.toSeq
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.matches("b\\d+"))
      .map { bdir =>
        val files = Files.walk(bdir).iterator().asScala.toSeq
          .filter(Files.isRegularFile(_))
          .map { f =>
            val md5 = MessageDigest.getInstance("MD5").digest(Files.readAllBytes(f))
            (bdir.relativize(f).toString, md5.map("%02x".format(_)).mkString)
          }
          .sortBy(_._1)
        bdir.getFileName.toString -> files
      }.toMap
  }

  private def bucketOf(key: Long, numBuckets: Int): Int =
    // the same Spark expression the writer uses — never a driver-side hash
    df(key -> "x").select(BucketedDir.bucketCol("key", numBuckets)).collect()(0).getInt(0)

  test("driver-side point-query routing == the write-path bucket expression (int/long/string/null)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.IntegerType
    val nb = 17
    // longs: extremes, sign boundary, typical ids
    val longKeys = Seq(Long.MinValue, -987654321L, -1L, 0L, 1L, 42L, 987654321L, Long.MaxValue)
    spark.createDataFrame(longKeys.map(k => Row(k, "x")).asJava, schema)
      .select(col("key"), BucketedDir.bucketCol("key", nb).as("b")).collect().foreach { r =>
        assert(BucketedDir.routeKey(r.getLong(0), LongType, nb) == r.getInt(1),
          s"long key ${r.getLong(0)}")
      }
    // ints hash differently from the same-valued long — keyType matters
    val intSchema = StructType(Seq(StructField("key", IntegerType, nullable = false)))
    val intKeys = Seq(Int.MinValue, -7, 0, 7, 42, Int.MaxValue)
    spark.createDataFrame(intKeys.map(k => Row(k)).asJava, intSchema)
      .select(col("key"), BucketedDir.bucketCol("key", nb).as("b")).collect().foreach { r =>
        assert(BucketedDir.routeKey(r.getInt(0), IntegerType, nb) == r.getInt(1),
          s"int key ${r.getInt(0)}")
      }
    // strings: empty, ascii, multi-byte unicode
    val strSchema = StructType(Seq(StructField("key", StringType, nullable = true)))
    val strKeys = Seq("", "a", "user:42", "käse", "日本語テキスト", "a" * 300)
    spark.createDataFrame(strKeys.map(k => Row(k)).asJava, strSchema)
      .select(col("key"), BucketedDir.bucketCol("key", nb).as("b")).collect().foreach { r =>
        assert(BucketedDir.routeKey(r.getString(0), StringType, nb) == r.getInt(1),
          s"string key '${r.getString(0).take(20)}'")
      }
    // null key routes to the xxhash64 seed bucket on both paths
    val nullBucket = spark.createDataFrame(Seq(Row(null)).asJava, strSchema)
      .select(BucketedDir.bucketCol("key", nb)).collect()(0).getInt(0)
    assert(BucketedDir.routeKey(null, StringType, nb) == nullBucket, "null key")
  }

  test("merge rewrites only the buckets containing batch keys; others stay byte-identical") {
    val root = tmp()
    val nb = 8
    val c = new BucketedParquetConnector(spark, "key", schema, root, numBuckets = nb)
    c.upsert(df((1L to 40L).map(k => k -> s"v$k"): _*))
    val before = snapshot(root)
    assert(before.size > 1, s"seed batch should span several buckets, got ${before.keys}")

    val hot = 7L
    val hotBucket = BucketedDir.bucketName(bucketOf(hot, nb))
    c.upsert(df(hot -> "updated"))
    val after = snapshot(root)

    for ((b, files) <- before if b != hotBucket)
      assert(after(b) == files, s"untouched bucket $b was rewritten")
    assert(after(hotBucket) != before(hotBucket), "touched bucket must advance")
    // and the table reads back correctly through the single-scan path
    val got = c.bulkQuery().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(hot) == "updated" && got.size == 40)
  }

  test("delete rewrites only the deleted keys' buckets") {
    val root = tmp()
    val nb = 8
    val c = new BucketedParquetConnector(spark, "key", schema, root, numBuckets = nb)
    c.upsert(df((1L to 40L).map(k => k -> s"v$k"): _*))
    val before = snapshot(root)
    val victim = 13L
    val vb = BucketedDir.bucketName(bucketOf(victim, nb))
    c.delete(Seq(victim))
    val after = snapshot(root)
    for ((b, files) <- before if b != vb)
      assert(after(b) == files, s"untouched bucket $b was rewritten by delete")
    assert(c.pointQuery(victim).isEmpty && c.count() == 39)
  }

  test("pointQuery reads ONLY the key's hash bucket") {
    val root = tmp()
    val nb = 8
    val c = new BucketedParquetConnector(spark, "key", schema, root, numBuckets = nb)
    c.upsert(df((1L to 40L).map(k => k -> s"v$k"): _*))
    val key = 7L
    val keep = BucketedDir.bucketName(bucketOf(key, nb))
    // Physically remove every OTHER bucket: if the lookup touched any of
    // them it would fail; succeeding proves the scan is bucket-pruned.
    Files.list(Paths.get(root)).iterator().asScala.toSeq
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.matches("b\\d+"))
      .filter(_.getFileName.toString != keep)
      .foreach { bdir =>
        Files.walk(bdir).iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    assert(c.pointQuery(key).map(_.getString(1)) == Some(s"v$key"))
    // a key routed to a (now-absent) bucket is a clean miss, not an error
    val gone = (1L to 40L).find(k => bucketOf(k, nb) != bucketOf(key, nb)).get
    assert(c.pointQuery(gone).isEmpty)
  }

  test("concurrent publishes: numBuckets >> pool still lands every touched bucket") {
    // 64 buckets touched at once through the bounded 8-thread publish
    // pool (local[4] session): every bucket must land its rows and an
    // immediate second merge must advance versions without interference.
    val root = tmp()
    val nb = 64
    val keys = (1L to 400L)
    val touched = BucketedDir.merge(spark, root, df(keys.map(k => k -> s"v$k"): _*),
      "key", nb) { (existing, part) =>
      existing.map(_.unionByName(part)).getOrElse(part)
    }
    assert(touched.size > 8, s"expected the batch to span >8 buckets, got ${touched.size}")
    val got = BucketedDir.read(spark, root).get.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 400 && keys.forall(k => got(k) == s"v$k"),
      "every row must land exactly once across all concurrently-published buckets")
    // second wide merge on the same table: versions advance per bucket
    BucketedDir.merge(spark, root, df(keys.map(k => k -> s"w$k"): _*),
      "key", nb, minVersion = 1L) { (existing, part) => part }
    val got2 = BucketedDir.read(spark, root).get.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2.size == 400 && keys.forall(k => got2(k) == s"w$k"))
  }

  test("first bucketed merge into a legacy flat table migrates its rows (no silent loss)") {
    import spark.implicits._
    import graft.streaming.StreamingFeatures.KeyFeature
    val root = tmp()
    // a pre-bucketed sink version wrote a FLAT VersionedDir at this root
    graft.state.VersionedDir.publish(spark, root,
      (1 to 20).map(i => KeyFeature(s"k$i", 1, i.toDouble, 1)).toDS().toDF())
    // upgrade path: the first bucketed merge must carry the 20 legacy
    // rows into the buckets, not shadow them
    graft.streaming.FeatureTableSink.merge(spark, root,
      Seq(KeyFeature("k7", 5, 99.0, 2), KeyFeature("k99", 1, 1.0, 1)).toDS(),
      0, numBuckets = 8)
    val t = graft.streaming.FeatureTableSink.read(spark, root)
      .as[KeyFeature].collect().map(f => f.key -> f.value).toMap
    assert(t.size == 21, s"legacy rows must survive the upgrade, got ${t.size}")
    assert(t("k7") == 99.0 && t("k99") == 1.0 && t("k3") == 3.0)
    // the flat layout is retired: no v* dirs remain at the root
    assert(!Files.list(Paths.get(root)).iterator().asScala
      .exists(_.getFileName.toString.startsWith("v0")),
      "flat v* dirs must be deleted after seeding")
    // and subsequent merges stay bucket-pruned
    val before = snapshot(root)
    graft.streaming.FeatureTableSink.merge(spark, root,
      Seq(KeyFeature("k7", 9, 100.0, 3)).toDS(), 1, numBuckets = 8)
    val after = snapshot(root)
    assert(before.keys.count(b => after(b) != before(b)) == 1)
  }

  test("bucket count is pinned: a mismatched merge is refused") {
    val root = tmp()
    new BucketedParquetConnector(spark, "key", schema, root, numBuckets = 8)
      .upsert(df(1L -> "a"))
    val wrong = new BucketedParquetConnector(spark, "key", schema, root, numBuckets = 16)
    intercept[IllegalArgumentException](wrong.upsert(df(2L -> "b")))
  }

  test("streaming sink merge is bucket-pruned end to end") {
    import spark.implicits._
    import graft.streaming.StreamingFeatures.KeyFeature
    val root = tmp()
    val seed = (1 to 40).map(i => KeyFeature(s"k$i", 1, i.toDouble, 1)).toDS()
    graft.streaming.FeatureTableSink.merge(spark, root, seed, 0, numBuckets = 8)
    val before = snapshot(root)
    assert(before.size > 1)
    graft.streaming.FeatureTableSink.merge(spark, root,
      Seq(KeyFeature("k7", 5, 99.0, 2)).toDS(), 1, numBuckets = 8)
    val after = snapshot(root)
    val changed = before.keys.filter(b => after(b) != before(b))
    assert(changed.size == 1, s"exactly one bucket should change, got: $changed")
    val t = graft.streaming.FeatureTableSink.read(spark, root).as[KeyFeature].collect()
    assert(t.length == 40 && t.find(_.key == "k7").get.value == 99.0)
  }
}
