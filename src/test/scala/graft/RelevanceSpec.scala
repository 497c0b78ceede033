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
}
