package graft

import graft.llm.Relevance

/** Unit coverage for TF-IDF / BM25 on a constructed 3-doc corpus with
  * hand-computed expected scores (ADVICE r3: Relevance previously had
  * only the driver oracle, no ScalaTest signal).
  *
  * Corpus: d1 "apple banana apple", d2 "banana cherry",
  * d3 "cherry cherry durian" — N=3, df(apple)=df(durian)=1,
  * df(banana)=df(cherry)=2.
  */
class RelevanceSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq((1L, "apple banana apple"), (2L, "banana cherry"), (3L, "cherry cherry durian"))
      .toDF("doc_id", "text")
  }

  test("tfIdf: smoothed idf, top-1 per doc, tie broken by term") {
    val got = Relevance.tfIdf(spark, docs, "doc_id", "text", k = 1)
      .collect().map(r => r.getAs[Long]("doc") ->
        (r.getAs[String]("term"), r.getAs[Double]("tfidf"))).toMap
    // idf(df=1) = ln(4/2)+1, idf(df=2) = ln(4/3)+1; tfidf = tf * idf
    val idf1 = math.log(2.0) + 1
    val idf2 = math.log(4.0 / 3.0) + 1
    assert(got(1L)._1 == "apple")
    assert(math.abs(got(1L)._2 - BigDecimal(2 * idf1).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // d2: banana and cherry tie at 1*idf2 — term asc keeps banana
    assert(got(2L)._1 == "banana")
    assert(math.abs(got(2L)._2 - BigDecimal(idf2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(got(3L)._1 == "cherry")
  }

  test("bm25: only matching docs scored, ranked by score desc") {
    val got = Relevance.bm25(spark, docs, "doc_id", "text",
      queryTerms = Seq("cherry"), k = 3)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc"), r.getAs[Double]("score")))
    assert(got.length == 2, "d1 has no query term and must not be scored")
    // idf = ln(1 + (3-2+0.5)/(2+0.5)) = ln(1.6); avgdl = 8/3
    val idf = math.log(1.6)
    val avgdl = 8.0 / 3.0
    def s(tf: Double, dl: Double) =
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((1L, 3L, s(2, 3))), s"got ${got(0)}, want d3 at ${s(2, 3)}")
    assert(got(1) == ((2L, 2L, s(1, 2))), s"got ${got(1)}, want d2 at ${s(1, 2)}")
  }

  // ------------------------------------------- retrieval eval metrics

  private def rankFrame(rows: Seq[(Long, Int, Long)]) = {
    import spark.implicits._
    rows.toDF("qid", "rank", "nid")
  }

  test("rankingMetrics: perfect candidates score 1.0 on all metrics") {
    val truth = rankFrame(Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L)))
    val got = Relevance.rankingMetrics(truth, truth, k = 3).collect().head
    assert(got.getAs[Long]("n_truth") == 3 && got.getAs[Long]("n_hits") == 3)
    assert(got.getAs[Double]("recall") == 1.0)
    assert(got.getAs[Double]("mrr") == 1.0)
    assert(got.getAs[Double]("ndcg") == 1.0)
  }

  test("rankingMetrics: partial hit — hand-computed recall/MRR/nDCG") {
    val truth = rankFrame(Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L)))
    val cand = rankFrame(Seq((1L, 1, 99L), (1L, 2, 20L), (1L, 3, 98L)))
    val got = Relevance.rankingMetrics(truth, cand, k = 3).collect().head
    val w = Relevance.dcgWeights(3).map(_.doubleValue)
    assert(got.getAs[Long]("n_hits") == 1)
    assert(got.getAs[Double]("recall") ==
      BigDecimal(1.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got.getAs[Double]("mrr") == 0.5, "first hit at candidate rank 2")
    val wantNdcg = BigDecimal(w(1) / (w(0) + w(1) + w(2)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Double]("ndcg") == wantNdcg)
  }

  test("rankingMetrics: query missing from candidates still emits a zero row") {
    val truth = rankFrame(Seq((1L, 1, 10L), (2L, 1, 10L), (2L, 2, 20L)))
    val cand = rankFrame(Seq((1L, 1, 10L)))
    val got = Relevance.rankingMetrics(truth, cand, k = 3)
      .collect().map(r => r.getAs[Long]("qid") -> r).toMap
    assert(got.size == 2, "no query may be dropped")
    assert(got(1L).getAs[Double]("recall") == 1.0)
    val z = got(2L)
    assert(z.getAs[Long]("n_hits") == 0 && z.getAs[Double]("recall") == 0.0 &&
      z.getAs[Double]("mrr") == 0.0 && z.getAs[Double]("ndcg") == 0.0)
  }

  test("rankingMetrics: ranks beyond k are ignored on both sides") {
    val truth = rankFrame(Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L)))
    val cand = rankFrame(Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L)))
    val got = Relevance.rankingMetrics(truth, cand, k = 2).collect().head
    assert(got.getAs[Long]("n_truth") == 2, "truth rank 3 must be cut at k=2")
    assert(got.getAs[Long]("n_hits") == 2 && got.getAs[Double]("ndcg") == 1.0)
  }

  test("rrfFuse: doc in both lists outranks both singles; quantized sums") {
    import spark.implicits._
    val l1 = Seq((1L, 1L), (2L, 2L)).toDF("doc", "rank")
    val l2 = Seq((2L, 1L), (3L, 2L)).toDF("doc", "rank")
    val got = Relevance.rrfFuse(Seq(l1, l2), k0 = 60, k = 10)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc"),
        r.getAs[Long]("n_lists"), r.getAs[Double]("fused")))
    def q6(d: Double) = new java.math.BigDecimal(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got.map(t => (t._1, t._2)).toList == List((1L, 2L), (2L, 1L), (3L, 3L)))
    val m = got.map(t => t._2 -> t).toMap
    assert(m(2L)._3 == 2L && math.abs(m(2L)._4 - (q6(1.0 / 61) + q6(1.0 / 62))) < 1e-9)
    assert(math.abs(m(1L)._4 - q6(1.0 / 61)) < 1e-9)
  }

  test("queryLikelihood: smoothing scores missing query terms; hand computation") {
    import spark.implicits._
    // query-term corpus freqs: a:3 (d1:2, d2:1), b:1 (d2);
    // T = ALL corpus tokens incl. the non-matching d3 = 4 + 3 + 4 = 11.
    val docs = Seq(
      (1L, "a a x y"),   // matches a, missing b — smoothing still scores b
      (2L, "a b z"),
      (3L, "x y z w")    // no match: not a candidate
    ).toDF("doc_id", "text")
    val got = graft.llm.Relevance.queryLikelihood(spark, docs, "doc_id", "text",
        Seq("a", "b"), k = 10, mu = 10.0)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(1L, 2L), s"only matching docs are candidates: ${got.keySet}")
    def q6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    def s(tf: Long, ctf: Long, dl: Long) =
      q6(math.log((tf + 10.0 * ctf / 11.0) / (dl + 10.0)))
    // d1: a(tf=2,ctf=3,dl=4), b(tf=0,ctf=1,dl=4); d2: a(1,3,3), b(1,1,3)
    assert(math.abs(got(1L)._2 - (s(2, 3, 4) + s(0, 1, 4))) < 1e-9)
    assert(math.abs(got(2L)._2 - (s(1, 3, 3) + s(1, 1, 3))) < 1e-9)
    assert(got(1L)._1 == 1L && got(2L)._1 == 2L, "n_terms_hit counts only tf>0 terms")
  }

  test("snippets: densest window wins, earliest tie, short docs degrade gracefully") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x cat dog x cat cat dog x x"), // densest 3-window at pos 5 (cat cat dog)
      (2L, "cat dog x x x cat dog x"),       // two 2-hit windows: earliest (pos 1) wins... but pos 6 has cat dog too
      (3L, "tiny doc")                        // shorter than the window
    ).toDF("doc_id", "text")
    val hits = Seq(Tuple1(1L), Tuple1(2L), Tuple1(3L)).toDF("doc")
    val got = graft.llm.Relevance.snippets(docs, "doc_id", "text",
        hits, "doc", Seq("cat", "dog"), window = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((5L, 3L, "x cat cat")) || got(1L) == ((6L, 3L, "cat cat dog")),
      s"doc 1 must find a 3-hit window: ${got(1L)}")
    assert(got(1L)._2 == 3L && got(1L)._1 == 6L, s"earliest max window: ${got(1L)}")
    assert(got(2L) == ((1L, 2L, "cat dog x")), s"earliest of tied windows: ${got(2L)}")
    assert(got(3L) == ((1L, 0L, "tiny doc")), s"short doc is its own window: ${got(3L)}")
  }
}
