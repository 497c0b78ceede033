package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning — tokenizer-vocabulary induction,
  * the step a training-data pipeline runs BEFORE token counting and
  * sequence packing mean anything (reference scope: the pipeline's
  * `tokenize` stages assume a trained vocab; this learns one).
  *
  * Classic Sennrich BPE on word-frequency statistics: words split into
  * character symbols; each iteration counts adjacent symbol pairs
  * (weighted by word frequency, overlapping positions counted), merges
  * the most frequent pair everywhere (greedy left-to-right,
  * non-overlapping within a word), and repeats. Ties break by
  * (count desc, left, right) — fully deterministic.
  *
  * Cross-engine exactness: a word's symbol sequence is encoded as a
  * DOUBLE-spaced string (`"  a  b  c  "`). Merging pair (l, r) is then
  * `replace(sp, " l  r ", " lr ")` — plain string replace scans
  * left-to-right and continues AFTER each replacement in both engines,
  * which on this encoding is exactly the greedy non-overlapping pair
  * merge (the single boundary spaces around the pattern can't be
  * reused by an overlapping match, and the replacement restores the
  * double-space invariant). The DuckDB oracle replays every iteration
  * with the same replace, so the learned merge table hash-matches.
  *
  * Scale shape: the corpus is touched ONCE (word explode + count); all
  * iterations run on the distinct-word table — orders of magnitude
  * smaller, still distributed (a web corpus has billions of distinct
  * words). Each iteration is one pair-explode aggregate with map-side
  * combine and a TakeOrdered(1) — no sort, no collect of data; only
  * the single winning pair (the model) reaches the driver, exactly
  * like [[Similarity.lshTopKLearned]]'s plane sample. The merged word
  * table is localCheckpoint'ed per round so plan depth stays constant.
  */
object Bpe {

  /** One learned merge: step (1-based), the pair, and its weighted
    * adjacency count at the time of the merge.
    */
  final case class Merge(step: Long, left: String, right: String, pairCount: Long)

  /** Double-spaced character-symbol encoding of a word. */
  private def spacedChars(w: Column): Column =
    concat(lit("  "),
      array_join(transform(sequence(lit(1), length(w)), i => substring(w, i, lit(1))), "  "),
      lit("  "))

  /** Literal (non-regex) replace — the catalyst StringReplace
    * expression: left-to-right, non-overlapping, scan continues after
    * each replacement. EXACTLY DuckDB's `replace`, which is what the
    * oracle replays; also codegen'd with no regex machinery on the
    * per-word hot path.
    */
  private def replaceLit(src: Column, search: String, repl: String): Column = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.{Literal, StringReplace}
    Bridge.column(StringReplace(Bridge.expression(src), Literal(search), Literal(repl)))
  }

  /** Adjacent symbol pairs of a spaced encoding, as (l, r) structs;
    * empty for single-symbol words (guarded — `sequence` would count
    * backwards on a negative range).
    */
  private def adjacentPairs(sp: Column): Column = {
    val syms = filter(split(sp, " "), x => x =!= "")
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1), j =>
        struct(element_at(syms, j).as("l"), element_at(syms, j + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
  }

  /** Learn `nMerges` BPE merges from the corpus. Returns the merge
    * table (step, left, right, pair_count) — the model artifact; stops
    * early if no adjacent pair remains.
    */
  def learnMerges(
      spark: SparkSession,
      docs: DataFrame,
      textCol: String,
      nMerges: Int
  ): DataFrame = {
    require(nMerges > 0, s"nMerges must be positive, got $nMerges")
    val wordFreq = docs
      .select(explode(TextOps.words(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    var cur = wordFreq
      .select(col("freq"), spacedChars(col("w")).as("sp"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = cur
        .select(col("freq"), explode(adjacentPairs(col("sp"))).as("pr"))
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step.toLong, l, r, cnt)
        cur = cur
          .withColumn("sp", replaceLit(col("sp"), s" $l  $r ", s" $l$r "))
          .localCheckpoint(false)
        step += 1
      }
    }
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("step", LongType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    val rows: java.util.List[Row] =
      java.util.Arrays.asList(merges.toSeq.map(m => Row(m.step, m.left, m.right, m.pairCount)): _*)
    spark.createDataFrame(rows, schema)
  }

  /** Segment words with a learned merge table: replay the merges in
    * order over the spaced encoding and count surviving symbols — the
    * trained-tokenizer token count per document.
    *
    * The merge chain runs per DISTINCT word (the vocabulary), not per
    * word occurrence: per-(doc, word) counts aggregate first (map-side
    * combine), the vocabulary segments once, and a word-keyed join
    * carries the symbol count back — at web scale that is billions of
    * occurrences saved per merge step. No broadcast hint on the vocab
    * join (vocabularies are unbounded; AQE broadcasts small ones).
    */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String, merges: Seq[(String, String)]): DataFrame = {
    val perWord = merges.foldLeft(spacedChars(col("w"))) { case (sp, (l, r)) =>
      replaceLit(sp, s" $l  $r ", s" $l$r ")
    }
    val tf = docs
      .select(col(idCol).as("doc"), explode(TextOps.words(col(textCol))).as("w"))
      .groupBy(col("doc"), col("w")).agg(count(lit(1)).as("tf"))
    val vocab = tf.select(col("w")).distinct()
      .withColumn("n", size(filter(split(perWord, " "), x => x =!= "")).cast("long"))
    tf.join(vocab, "w")
      .groupBy(col("doc"))
      .agg(sum(col("tf") * col("n")).as("bpe_tokens"))
  }
}
