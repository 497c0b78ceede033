package graft

import graft.llm.Bpe

/** BPE merge learning: hand-computed merge sequence on the classic
  * low/lower/lowest corpus, greedy non-overlap on repeated symbols,
  * and trained-tokenizer token counts.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("learns the classic low/lower/lowest merge sequence") {
    val docs = Seq(Tuple1("low low low lower lowest")).toDF("text")
    val merges = Bpe.learnMerges(spark, docs, "text", 4)
      .orderBy("step")
      .as[(Long, String, String, Long)].collect().toList
    // pair counts: (l,o)=5 (o,w)=5 (w,e)=2 (e,r)=1 (e,s)=1 (s,t)=1
    // ties break lexicographically: (l,o) before (o,w)
    assert(merges == List(
      (1L, "l", "o", 5L),   // -> lo
      (2L, "lo", "w", 5L),  // -> low
      (3L, "low", "e", 2L), // lower + lowest
      (4L, "lowe", "r", 1L) // tie at 1: "lowe" < "s"
    ), s"got $merges")
  }

  test("repeated symbols: overlapping pairs counted, merges greedy non-overlapping") {
    val docs = Seq(Tuple1("aaaa")).toDF("text")
    val merges = Bpe.learnMerges(spark, docs, "text", 2)
      .orderBy("step")
      .as[(Long, String, String, Long)].collect().toList
    // "aaaa": 3 adjacent (a,a) positions; the merge collapses
    // left-to-right non-overlapping -> "aa aa", then one (aa,aa) pair
    assert(merges == List((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)), s"got $merges")
  }

  test("tokenCount applies the learned merges in order") {
    val docs = Seq((1L, "low lower"), (2L, "aaaa")).toDF("doc_id", "text")
    val counts = Bpe.tokenCount(docs, "doc_id", "text",
        Seq("l" -> "o", "lo" -> "w", "a" -> "a"))
      .orderBy("doc").as[(Long, Long)].collect().toMap
    // doc 1: low -> [low] (1), lower -> [low, e, r] (3)
    // doc 2: aaaa -> [aa, aa] (2)
    assert(counts == Map(1L -> 4L, 2L -> 2L), s"got $counts")
  }

  test("stops early when no pair remains") {
    val docs = Seq(Tuple1("a b c")).toDF("text") // all single-char words
    val merges = Bpe.learnMerges(spark, docs, "text", 5).collect()
    assert(merges.isEmpty)
  }
}
