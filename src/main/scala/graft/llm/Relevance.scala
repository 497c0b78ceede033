package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus relevance scoring: smoothed TF-IDF term weighting and BM25
  * ranked retrieval — the classic lexical-search / distinctive-term
  * operators a curation pipeline runs alongside dedup and quality
  * scoring (e.g. keyword-based corpus slicing, boilerplate term
  * discovery).
  *
  * Cross-engine FP discipline: every per-term score is rounded to 6
  * decimals and quantized to DECIMAL(18,6) BEFORE any aggregation or
  * ranking, so sums are exact decimal arithmetic (order-independent,
  * identical in Spark and the DuckDB oracle) and orderings never depend
  * on sub-ulp double differences between engines.
  *
  * Scale shape: one explode shuffle keyed by (doc, term) with map-side
  * combine; corpus-level scalars (N, avg doc length) ride along as a
  * broadcast single-row crossJoin — the big table shuffles once, per-doc
  * top-k survives through the bounded-heap TopKPerKey operator instead
  * of a full window sort. The tfIdf document-frequency join carries NO
  * broadcast hint (web-scale vocabularies are billions of terms; both
  * sides are already partitioned by `term` from their shared ancestor,
  * and AQE broadcasts at runtime when the vocabulary is actually small).
  * bm25's df table IS hint-broadcast — it is bounded by the query's own
  * term count, a genuine constant.
  */
object Relevance {

  /** Per-(doc, term) counts from whitespace tokenization — the shared
    * first stage: explode + count with partial aggregation below the
    * (doc, term) exchange.
    */
  private def termFreq(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // No Fan.out here (r13 verdict #4): the per-row work is a single
    // whitespace tokenize feeding an immediate partial aggregate, and
    // the round-robin exchange ships the FULL document text — on the
    // sub-second tfidf/commonness paths the exchange cost more than the
    // parallelism bought (q_tfidf_terms 0.83 → 1.03 s measured r13).
    // At real scale the scan is multi-split anyway and the fan would
    // no-op, so dropping it costs nothing there either.
    docs
      .select(col(idCol).as("doc"), explode(TextOps.words(col(textCol))).as("term"))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k most distinctive terms per document by smoothed TF-IDF:
    * `tfidf = tf * (ln((N+1)/(df+1)) + 1)` (the sklearn-style smooth
    * idf, so ubiquitous terms score tf·~1 rather than 0 and the ranking
    * stays total). Ties break by term.
    */
  def tfIdf(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tf = termFreq(docs, idCol, textCol)
    // df rows are one per distinct (doc, term) already — count, not
    // count-distinct. Vocabulary-sized = unbounded: no broadcast hint
    // (see object scaladoc); the term-keyed shuffle join reuses tf's
    // existing partitioning for the df side's aggregation.
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn(
        "tfidf_d",
        round(
          col("tf") * (log((col("n_docs") + 1).cast("double") / (col("df") + 1).cast("double")) + 1.0),
          6
        ).cast("decimal(18,6)"))
    graft.plans.TopKPerKey(spark, scored, Seq("doc"), Seq("tfidf_d" -> true, "term" -> false), k)
      .select(
        col("doc"),
        row_number().over(Window.partitionBy(col("doc")).orderBy(col("tfidf_d").desc, col("term")))
          .cast("long").as("rank"),
        col("term"), col("tf"), col("df"),
        col("tfidf_d").cast("double").as("tfidf"))
  }

  /** Unigram corpus-commonness scoring — the integer-exact stand-in for
    * unigram-LM perplexity filtering: per document, the average corpus
    * frequency of its tokens. Low commonness ≈ rare/garbled vocabulary
    * (or genuinely novel text), high ≈ boilerplate — the standard cheap
    * quality gate a pipeline runs next to [[TextAnalysis.quality]].
    *
    * Deliberately integer arithmetic end-to-end: the per-doc score is
    * Σ_terms tf·corpusFreq(term) (BIGINT, order-independent) divided
    * once by the token count — a single IEEE double op both engines
    * round identically, so the oracle hash-matches without any FP-fold
    * ceremony (a log-prob formulation would sum doubles in
    * engine-dependent order).
    *
    * Scale shape: tokens shuffle once keyed by (doc, term) with map-side
    * combine; the global frequency table aggregates FROM tf (reusing the
    * term partitioning) and joins back WITHOUT a broadcast hint — a
    * web-scale vocabulary is billions of terms (same rule as [[tfIdf]]).
    */
  def commonness(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = termFreq(docs, idCol, textCol)
    val gf = tf.groupBy(col("term")).agg(sum(col("tf")).as("freq"))
    tf.join(gf, "term")
      .groupBy(col("doc"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("freq")).as("weight_sum"))
      .select(
        col("doc"), col("n_tokens"), col("weight_sum"),
        (col("weight_sum").cast("double") / col("n_tokens").cast("double")).as("commonness"))
  }

  /** BM25 ranked retrieval for a bag-of-words query: the k best-scoring
    * documents, `score(D) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b +
    * b·dl/avgdl))` with the standard `idf(t) = ln(1 + (N − df + 0.5) /
    * (df + 0.5))` (Robertson-Spärck Jones). Only docs matching ≥1 query
    * term are scored — the term filter prunes the explode BEFORE the
    * (doc, term) shuffle, so cost scales with matching postings, not
    * corpus size. Global top-k resolves via TakeOrderedAndProject
    * (per-partition heads, never a full sort).
    */
  def bm25(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    // unfanned (r13 verdict #4): tokenize-into-aggregate only — the
    // fan's full-text exchange measurably taxed this sub-second path
    // (q_bm25_search 0.64 → 0.73 s r13; termFreq rationale applies)
    val base = docs
      .select(col(idCol).as("doc"), TextOps.words(col(textCol)).as("ws"))
    val dl = base.select(col("doc"), size(col("ws")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = base
      .select(col("doc"), explode(col("ws")).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nD = col("n_docs").cast("double")
    val dfD = col("df").cast("double")
    val tfD = col("tf").cast("double")
    val scored = tf
      .join(broadcast(df), "term")
      .join(dl, "doc")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / nD)
      .withColumn(
        "s_d",
        round(
          log(lit(1.0) + (nD - dfD + 0.5) / (dfD + 0.5)) *
            (tfD * (k1 + 1.0)) / (tfD + lit(k1) * (lit(1.0) - b + lit(b) * col("dl").cast("double") / col("avgdl"))),
          6
        ).cast("decimal(18,6)"))
    scored
      .groupBy(col("doc"))
      .agg(sum(col("s_d")).as("score_sum"), count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_sum").desc, col("doc"))
      .limit(k)
      // rank the ≤k survivors without WindowExec: a partitionless
      // window would log the move-everything-to-one-partition warning
      // on every run (and Catalyst eliminates foldable partition keys,
      // so a lit(0) spec degenerates right back). The limit output IS
      // one tiny partition — re-sort it in place and number the rows.
      .coalesce(1)
      .sortWithinPartitions(col("score_sum").desc, col("doc"))
      .select(
        (monotonically_increasing_id() + 1).cast("long").as("rank"),
        col("doc"), col("n_terms_hit"),
        col("score_sum").cast("double").as("score"))
  }

  /** Deterministic snippet extraction for a hit list — the
    * result-page stage after [[bm25]]/[[queryLikelihood]]: for each
    * hit doc, the `window`-word span containing the MOST query-term
    * occurrences (ties to the earliest span), its 1-based start
    * position and hit count. Pure integer window scoring over the
    * word array (no floats anywhere), so spans, counts, and the
    * re-joined snippet text are oracle-exact.
    *
    * Scale shape: `hits` is a top-k list — control-plane sized by
    * construction — broadcast onto the corpus scan (the id join prunes
    * to k rows), and the O(n·window) span scoring runs on those k
    * docs only. The (doc, ws) frame checkpoints because the word
    * array feeds every lambda in the scoring projection
    * (CollapseProject re-inlines projected arrays into HOF bodies —
    * repo invariant).
    */
  def snippets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      hits: DataFrame,
      hitCol: String,
      queryTerms: Seq[String],
      window: Int
  ): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(window >= 1, s"window must be >= 1, got $window")
    val base = docs
      .join(broadcast(hits.select(col(hitCol).as("doc")).distinct()),
        col(idCol) === col("doc"))
      .select(col("doc"), TextOps.words(col(textCol)).as("ws"))
      .localCheckpoint(false)
    val scores = transform(
      sequence(lit(1), greatest(size(col("ws")) - (window - 1), lit(1))),
      i => size(filter(slice(col("ws"), i, lit(window)),
        t => t.isInCollection(queryTerms))))
    base
      .withColumn("scores", scores)
      .withColumn("start", array_position(col("scores"), array_max(col("scores"))))
      .select(
        col("doc"), col("start"),
        element_at(col("scores"), col("start").cast("int")).cast("long").as("n_hits"),
        array_join(slice(col("ws"), col("start").cast("int"), lit(window)), " ").as("snippet"))
  }

  /** Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty
    * 2001) — the language-modeling member of the ranking family next
    * to [[bm25]]: `score(D) = Σ_{t ∈ Q} ln((tf + μ·ctf/T) / (dl + μ))`
    * with ctf the term's corpus frequency and T the corpus token
    * count. Candidates are docs matching ≥ 1 query term (the practical
    * QL candidate set — smoothing then scores their ZERO-tf query
    * terms too, which is what separates QL's ranking from BM25's);
    * query terms absent from the corpus drop out (no evidence, and
    * ln 0 otherwise).
    *
    * Cross-engine exactness: each term score is one identical IEEE
    * chain (multiply, two divisions, add, ln) quantized
    * round(6)→DECIMAL(18,6) before the exact per-doc sum — the bm25
    * discipline; μ enters both engines as the same double literal.
    *
    * Scale shape: the term filter prunes the explode BEFORE the
    * (doc, term) shuffle; the dense candidate × queryTerms expansion
    * rides crossJoin(broadcast(ctf)) — |Q| rows, the capped-side
    * precedent — and the global top-k resolves via
    * TakeOrderedAndProject into the coalesced no-WindowExec tail.
    */
  def queryLikelihood(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      mu: Double = 2000.0
  ): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k > 0 && mu > 0, s"k and mu must be positive, got $k/$mu")
    // unfanned (r13 verdict #4): same rationale as bm25 — q_ql_search
    // measured 0.90x with the fan's full-text exchange
    val base = docs
      .select(col(idCol).as("doc"), TextOps.words(col(textCol)).as("ws"))
    val dl = base.select(col("doc"), size(col("ws")).cast("long").as("dl"))
    val total = dl.agg(sum(col("dl")).as("t"))
    val tf = base
      .select(col("doc"), explode(col("ws")).as("term"))
      .filter(col("term").isInCollection(queryTerms))
      .groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false) // feeds ctf, candidates AND the dense join
    val ctf = tf.groupBy(col("term")).agg(sum(col("tf")).as("ctf"))
    val cands = tf.select(col("doc")).distinct()
    val tf0 = coalesce(col("tf"), lit(0L)).cast("double")
    val scored = cands
      .crossJoin(broadcast(ctf))
      .join(tf, Seq("doc", "term"), "left")
      .join(dl, "doc")
      .crossJoin(broadcast(total))
      .withColumn("s_t",
        round(log(
          (tf0 + lit(mu) * col("ctf").cast("double") / col("t").cast("double")) /
            (col("dl").cast("double") + lit(mu))), 6)
          .cast("decimal(18,6)"))
      .withColumn("hit", when(coalesce(col("tf"), lit(0L)) > 0, 1L).otherwise(0L))
    scored
      .groupBy(col("doc"))
      .agg(sum(col("s_t")).as("score_sum"), sum(col("hit")).as("n_terms_hit"))
      .orderBy(col("score_sum").desc, col("doc"))
      .limit(k)
      .coalesce(1)
      .sortWithinPartitions(col("score_sum").desc, col("doc"))
      .select(
        (monotonically_increasing_id() + 1).cast("long").as("rank"),
        col("doc"), col("n_terms_hit"),
        col("score_sum").cast("double").as("score"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of any number of
    * (doc, rank) rankings — the standard hybrid-search combiner (BM25
    * list ⊕ ANN list) that needs no score calibration: each list
    * contributes `1/(k0 + rank)` for the docs it ranked, fused score =
    * the sum, ties toward the smaller doc id.
    *
    * Exactness: every reciprocal is quantized round(6)→DECIMAL(18,6)
    * before the sum (the per-term transcendental discipline applied to
    * rationals), so fusion totals are exact and the ordering is
    * engine-identical.
    *
    * Scale shape: rankings are top-k lists — control-plane sized by
    * construction; one union + one doc-keyed aggregate, global top-k
    * via TakeOrderedAndProject, ranked in the ≤k coalesced survivors
    * (the bm25 no-WindowExec tail).
    */
  def rrfFuse(rankings: Seq[DataFrame], k0: Int, k: Int): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k0 >= 0 && k > 0, s"k0 must be >= 0 and k positive, got $k0, $k")
    rankings
      .map(_.select(col("doc"),
        round(lit(1.0) / (col("rank") + lit(k0)).cast("double"), 6)
          .cast("decimal(18,6)").as("rr")))
      .reduce(_ unionAll _)
      .groupBy(col("doc"))
      .agg(sum(col("rr")).as("fused_d"), count(lit(1)).as("n_lists"))
      .orderBy(col("fused_d").desc, col("doc"))
      .limit(k)
      .coalesce(1)
      .sortWithinPartitions(col("fused_d").desc, col("doc"))
      .select(
        (monotonically_increasing_id() + 1).cast("long").as("rank"),
        col("doc"), col("n_lists"),
        col("fused_d").cast("double").as("fused"))
  }

  /** DCG position weights 1/log2(rank+1) for ranks 1..k, pre-rounded
    * to 6 decimals ON THE DRIVER so both engines consume identical
    * DECIMAL literals — the shared-literal discipline (Windows
    * .decayedSum's ln2) extended to a whole table of constants: the
    * oracle SQL is generated from this same sequence, so no engine
    * ever evaluates log2 and libm last-ulp differences cannot exist.
    */
  private[graft] def dcgWeights(k: Int): IndexedSeq[java.math.BigDecimal] =
    (1 to k).map { i =>
      new java.math.BigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
        .setScale(6, java.math.RoundingMode.HALF_UP)
    }

  /** Retrieval-quality evaluation: per-query recall@k, MRR and nDCG@k
    * of a candidate ranking against a ground-truth top-k — the metric
    * suite that grades an ANN index (LSH / IVF / PQ funnels) against
    * the brute-force truth it approximates. Both inputs are
    * `(qid, rank, nid)` frames as produced by the Similarity top-k
    * operators; relevance is binary membership in the truth set.
    *
    * Exactness: DCG terms are the driver-shared DECIMAL(18,6) weights
    * (`dcgWeights`), summed exactly; recall and MRR are ratios of
    * integers ≤ k, whose decimal expansions terminate well inside 6
    * digits (k ≤ 10), so the final round(…, 6) is boundary-safe.
    *
    * Scale shape: inputs are queries×k rows — already the SMALL side
    * of any pipeline (the corpus never enters this operator). One
    * (qid, nid) equi-join marks hits, two per-qid aggregations with
    * map-side combine, one qid join to stitch truth-side norms
    * (n_truth, ideal DCG) to candidate-side sums. Queries missing from
    * the candidate frame (index returned nothing) still emit a row
    * with zero metrics — evaluation never silently drops a query.
    */
  def rankingMetrics(truth: DataFrame, cand: DataFrame, k: Int): DataFrame = {
    require(k > 0 && k <= 10,
      s"k must be in 1..10 (ratio round(,6) boundary-safety argument), got $k")
    val ws = dcgWeights(k)
    def wOf(r: Column): Column =
      (1 to k).foldLeft(lit(null).cast("decimal(18,6)")) { (acc, i) =>
        when(r === i, lit(ws(i - 1)).cast("decimal(18,6)")).otherwise(acc)
      }
    val zeroDec = lit(new java.math.BigDecimal(0).setScale(6)).cast("decimal(18,6)")

    val t = truth.select(col("qid"), col("rank"), col("nid")).filter(col("rank") <= k)
    val c = cand.select(col("qid"), col("rank"), col("nid")).filter(col("rank") <= k)

    val truthAgg = t.groupBy(col("qid")).agg(
      count(lit(1)).as("n_truth"),
      sum(wOf(col("rank"))).as("idcg"))
    val marked = c.join(
      t.select(col("qid"), col("nid"), lit(1).as("rel")), Seq("qid", "nid"), "left")
    val candAgg = marked.groupBy(col("qid")).agg(
      sum(coalesce(col("rel"), lit(0))).as("n_hits"),
      min(when(col("rel") === 1, col("rank"))).as("first_hit"),
      sum(when(col("rel") === 1, wOf(col("rank"))).otherwise(zeroDec)).as("dcg"))

    truthAgg.join(candAgg, Seq("qid"), "left").select(
      col("qid"),
      col("n_truth"),
      coalesce(col("n_hits"), lit(0L)).as("n_hits"),
      round(coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_truth"), 6)
        .as("recall"),
      coalesce(round(lit(1.0) / col("first_hit"), 6), lit(0.0)).as("mrr"),
      round(coalesce(col("dcg"), zeroDec).cast("double") / col("idcg").cast("double"), 6)
        .as("ndcg"))
  }
}
