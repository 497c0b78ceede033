package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomKernels
import graft.llm.{Dedup, Sketches}

/** Bloom membership sketch (graft.functions.BloomBuild / BloomOr /
  * BloomContains) and the incremental-ingest exact gate built on it
  * (Dedup.bloomGate): one-sided error, OR-mergeability, partition
  * invariance, and gate ≡ plain exact join.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private val Bits = 1 << 16
  private val Hashes = 5

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("no false negatives: every inserted key probes true") {
    val keys = spark.range(0, 4000).select((col("id") * 2654435761L).as("k"))
    val bloom = keys.agg(Sketches.bloomAgg(col("k"), Bits, Hashes))
      .head().getAs[Array[Byte]](0)
    val misses = keys.filter(!Sketches.bloomContains(lit(bloom), col("k"))).count()
    assert(misses === 0L)
  }

  test("false-positive rate on disjoint keys stays near the design point") {
    // 4000 keys into 2^16 bits at 5 hashes: theoretical fpp
    // (1 - e^(-kn/m))^k ~ 0.9%; assert within 3x of it
    val keys = spark.range(0, 4000).select((col("id") * 2654435761L).as("k"))
    val bloom = keys.agg(Sketches.bloomAgg(col("k"), Bits, Hashes))
      .head().getAs[Array[Byte]](0)
    val probes = spark.range(100000, 120000).select((col("id") * 2654435761L).as("k"))
    val fp = probes.filter(Sketches.bloomContains(lit(bloom), col("k"))).count()
    val fpp = fp.toDouble / 20000
    assert(fpp < 0.03, s"measured fpp $fpp (expected ~0.009)")
  }

  test("build is partition-invariant and per-slice blooms OR to the direct bloom") {
    val keyed = docs.select(graft.functions.GraftFunctions.strhash(col("text")).as("k"),
      col("source"))
    val direct = keyed.repartition(1).agg(Sketches.bloomAgg(col("k"), Bits, Hashes))
      .head().getAs[Array[Byte]](0)
    val shuffled = keyed.repartition(13).agg(Sketches.bloomAgg(col("k"), Bits, Hashes))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, shuffled),
      "bloom must be byte-identical under any partitioning")
    val merged = keyed.groupBy(col("source"))
      .agg(Sketches.bloomAgg(col("k"), Bits, Hashes).as("b"))
      .agg(Sketches.bloomOrAgg(col("b")))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(direct, merged),
      "OR of per-source blooms must equal the corpus bloom")
  }

  test("mismatched geometries fail loudly instead of probing wrong") {
    val a = spark.range(10).agg(Sketches.bloomAgg(col("id"), 1 << 10, Hashes).as("b"))
    val b = spark.range(10).agg(Sketches.bloomAgg(col("id"), 1 << 12, Hashes).as("b"))
    val ex = intercept[Exception] {
      a.unionAll(b).agg(Sketches.bloomOrAgg(col("b"))).head()
    }
    assert(ex.getMessage.contains("mismatched bloom geometries")
      || ex.getCause != null && ex.getCause.getMessage.contains("mismatched bloom geometries"))
  }

  test("SQL registration round-trips build, or-merge, and probe") {
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.register(s2)
    s2.range(0, 100).createOrReplaceTempView("ks")
    val hit = s2.sql(
      s"""SELECT graft_bloom_contains(b, 42L) AS yes, graft_bloom_contains(b, 424242L) AS maybe
         |FROM (SELECT graft_bloom_or(b) AS b FROM
         |  (SELECT graft_bloom_build(id, ${1 << 14}, $Hashes) AS b FROM ks GROUP BY id % 4))
         |""".stripMargin).head()
    assert(hit.getBoolean(0), "inserted key must probe true through SQL")
    // 100 keys in 2^14 bits: a random absent key is overwhelmingly negative
    assert(!hit.getBoolean(1), "absent key probed true (fpp at this load is ~1e-9)")
  }

  test("null keys are skipped and null probes yield null") {
    val bloom = Seq(Some(7L), None, Some(9L)).toDF("k")
      .agg(Sketches.bloomAgg(col("k"), 1 << 10, Hashes))
      .head().getAs[Array[Byte]](0)
    val only = Seq(7L, 9L).toDF("k")
      .agg(Sketches.bloomAgg(col("k"), 1 << 10, Hashes))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bloom, only), "null key changed the bloom")
    val probed = Seq(Some(7L), None).toDF("k")
      .select(Sketches.bloomContains(lit(bloom), col("k")).as("hit")).collect()
    assert(probed(0).getBoolean(0) && probed(1).isNullAt(0))
  }

  test("kernel probe agrees with the aggregate's bit layout at word boundaries") {
    // keys chosen to land bits across word 0, word edges, and high words
    val ks = Seq(0L, 1L, 63L, 64L, Long.MaxValue, Long.MinValue, -1L)
    val bloom = ks.toDF("k").agg(Sketches.bloomAgg(col("k"), 1 << 10, Hashes))
      .head().getAs[Array[Byte]](0)
    ks.foreach(k => assert(BloomKernels.contains(bloom, k), s"lost key $k"))
  }

  test("bloomGate equals the un-pre-filtered exact join (one-sided error)") {
    val acc = docs.filter(col("doc_id") % 3 =!= 0 || col("doc_id") % 6 === 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val bloom = Dedup.corpusBloom(acc, "text", Bits, Hashes)
    val gated = Dedup.bloomGate(batch, acc, "doc_id", "text", bloom)
      .orderBy("doc").collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val truth = batch.as("b")
      .join(acc.select(col("text").as("t")).distinct(),
        col("text") === col("t"), "left")
      .select(col("doc_id").as("doc"), col("t").isNotNull.as("is_dup"))
      .orderBy("doc").collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(gated.toSeq == truth.toSeq)
    assert(gated.exists(_._2) && gated.exists(!_._2),
      "split must exercise both dup and new docs")
  }

  test("bloom-pruned signature handoff: identical pairs, genuinely pruned probe") {
    val newDocs = docs.filter(col("doc_id") % 2 === 1)
    val oldDocs = docs.filter(col("doc_id") % 2 === 0)
    val newSigs = Dedup.signatures(newDocs, "doc_id", "text").localCheckpoint(false)
    val oldSigs = Dedup.signatures(oldDocs, "doc_id", "text").localCheckpoint(false)
    val bloom = Dedup.sigBandBloom(oldSigs, Bits, Hashes)
    def pairs(b: Option[Array[Byte]]) =
      Dedup.minhashAgainstSigs(newSigs, oldSigs, 0.6, b)
        .orderBy("new_doc", "old_doc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pairs(Some(bloom)) == pairs(None) && pairs(None).nonEmpty,
      "bloom pruning must not change the pair set")
    // the probe is REALLY pruned: most new-side band cells are absent
    // from the old side and must die at the filter
    val bands = newSigs.select(
      posexplode(graft.llm.TextOps.bandDigests(col("sig"))).as(Seq("band", "digest")))
    val total = bands.count()
    val kept = bands.filter(
      Sketches.bloomContains(lit(bloom), Dedup.sigBandKey(col("band"), col("digest"))))
      .count()
    assert(kept < total / 2,
      s"expected the bloom to prune most of the probe, kept $kept of $total")
  }

  test("bloomGate: NULL-text docs keep their row and resolve definitely-new") {
    // ADVICE r6: strhash(NULL) is NULL, so the probe was NULL and the
    // row failed BOTH branch filters — vanishing instead of answering
    val acc = docs.filter(col("doc_id") % 4 =!= 0)
    val bloom = Dedup.corpusBloom(acc, "text", Bits, Hashes)
    val nulled = docs.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), lit(null).cast("string").as("text"))
    val dups = docs.filter(col("doc_id") % 4 === 1).select(col("doc_id"), col("text"))
    val batch = nulled.unionAll(dups)
    val nNull = nulled.count()
    val nDup = dups.count()
    val out = Dedup.bloomGate(batch, acc, "doc_id", "text", bloom)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(out.size == nNull + nDup, "one output row per input doc, NULL text included")
    assert(out.count { case (d, isDup) => d % 4 == 0 && !isDup } == nNull,
      "every NULL-text doc must keep its row and resolve definitely-new")
    assert(out.count { case (d, isDup) => d % 4 == 1 && isDup } == nDup,
      "accumulated-corpus docs still confirm as dups")
  }

  test("a batch with no accumulated overlap resolves every doc bloom-negative or via confirm") {
    // empty-accumulated edge: the bloom is all-zero bits, every probe is
    // false, and the gate answers all-new without touching the join path
    val acc = docs.filter(lit(false))
    val batch = docs.limit(20)
    val bloom = Dedup.corpusBloom(acc, "text", 1 << 10, Hashes)
    val out = Dedup.bloomGate(batch, acc, "doc_id", "text", bloom).collect()
    assert(out.length === 20 && out.forall(!_.getBoolean(1)))
  }
}
