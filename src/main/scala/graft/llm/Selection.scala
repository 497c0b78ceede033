package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.strhash

/** Budget-constrained corpus selection: keep the best documents, by a
  * deterministic ranking, until a token budget fills — the "select B
  * tokens of training data" step a pretraining pipeline runs after
  * scoring (greedy prefix selection in rank order, not a knapsack: the
  * first doc that would overflow is dropped and selection continues
  * with nothing — the budget is a prefix cut, documented and mirrored
  * by the oracle).
  *
  * The naive formulation is a cumulative sum over ONE global window —
  * a single-partition WindowExec that serializes the whole corpus
  * through one task. [[selectByBudget]] instead computes the exact
  * same global cumsum in two passes: range-repartition on the rank
  * order + in-partition sort, per-partition token totals to the driver
  * (one long per partition — control-plane), then each partition's
  * prefix sums offset by the totals of the partitions ranked before
  * it. Partition boundaries come from range sampling and are NOT
  * deterministic — but the cumsum they compute is: every doc's global
  * prefix total depends only on the (rank, id) order, so the SELECTED
  * SET is exact and engine-reproducible (SelectionSpec pins equality
  * with the naive window on a real corpus).
  */
object Selection {

  /** Loud ceiling on the data-dependent broadcast model tables the
    * hashed-LM family ships to every executor ([[dsirWeights]],
    * [[lmCrossEntropy]], [[lmCrossEntropyBigram]],
    * [[lmCrossEntropyTrigram]]). The n-gram models are sized by the
    * REFERENCE slice's distinct hashed n-grams — bounded by
    * `numBuckets` powers only in the worst case — so without a guard
    * the first symptom of an oversized reference at cluster scale is
    * an executor OOM or a silent multi-GB broadcast. 4M rows of
    * (≤3 longs + hash-relation overhead) is a few hundred MB — the
    * upper edge of a sane broadcast; past it the caller must coarsen
    * the model (lower `numBuckets`) or raise `maxModelRows`
    * deliberately. Same fail-loud contract as
    * [[graft.llm.TextIndex.probeAll]]'s 4096-query cap and
    * [[graft.operators.StatTests.chiSquareByKey]]'s 4096-cell grid.
    */
  val MaxBroadcastModelRows: Long = 4L << 20

  /** One control-plane count of the FINEST n-gram model (every other
    * model in the family is a group-by coarsening of the same rows, so
    * its row count is ≤ this one) + a loud `require` BEFORE the first
    * `broadcast()`. Runs eagerly at operator-call time — the count
    * re-aggregates the already-checkpointed token frame, and failing
    * here beats failing as an executor OOM mid-broadcast.
    */
  private def requireModelBroadcastable(
      finestModel: DataFrame,
      opName: String,
      numBuckets: Int,
      maxModelRows: Long
  ): Unit = {
    require(maxModelRows >= 1, s"maxModelRows must be >= 1, got $maxModelRows")
    val rows = finestModel.count()
    require(rows <= maxModelRows,
      s"$opName: the reference-slice n-gram model has $rows rows " +
        s"(> maxModelRows=$maxModelRows) — too large to broadcast to every " +
        s"executor. Lower numBuckets (currently $numBuckets) to coarsen the " +
        "hashed model, shrink the reference slice, or raise maxModelRows " +
        "deliberately if the cluster can take the broadcast.")
  }

  /** Docs whose cumulative token count, in (rankCol desc, id asc)
    * order, stays within `budgetTokens`. Output: id, the rank column,
    * `tokens`, and `cum_tokens` (the doc's inclusive prefix total).
    *
    * @param rankCol  quality/score column — quantize it (round / cast
    *                 decimal) BEFORE calling if it comes from float
    *                 arithmetic, so cross-engine ordering is stable
    */
  def selectByBudget(
      docs: DataFrame,
      idCol: String,
      rankCol: String,
      tokensCol: Column,
      budgetTokens: Long
  ): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val base = docs.select(col(idCol), col(rankCol), tokensCol.cast("long").as("tokens"))
    // the two-pass machinery lives in GlobalOrder (shared with
    // shardBalanced and Mixture.unimaxAllocation since round 7)
    graft.core.GlobalOrder
      .withPrefix(base, Seq(col(rankCol).desc, col(idCol).asc), col("tokens"),
        cumName = "cum_tokens", rankName = "_grk")
      .df
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col(idCol), col(rankCol), col("tokens"), col("cum_tokens"))
  }

  /** Balanced no-split sharding — the layout sibling of
    * [[graft.llm.TextAnalysis.packSequences]]'s concat-and-chop:
    * distribute WHOLE documents across `ceil(total_tokens /
    * budgetTokens)` shards with near-equal token mass (shard files for
    * N trainers, per-worker tokenization inputs). Greedy LPT-style:
    * docs in (tokens desc, id) order round-robin over the shards,
    * which bounds every shard's load by avg + max-doc-tokens — and is
    * deterministic, unlike a best-fit heap, so the oracle replays it
    * with plain rank arithmetic.
    *
    * The global rank runs the same two-pass shape as
    * [[selectByBudget]]: range-repartition + in-partition sort,
    * per-partition row counts to the driver (control-plane sized),
    * per-partition offsets broadcast back — never a single-partition
    * window. Output: id, tokens, shard (0-based), n_shards.
    */
  def shardBalanced(
      docs: DataFrame,
      idCol: String,
      tokensCol: Column,
      budgetTokens: Long
  ): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val base = docs.select(col(idCol), tokensCol.cast("long").as("tokens"))
    val pf = graft.core.GlobalOrder
      .withPrefix(base, Seq(col("tokens").desc, col(idCol).asc), col("tokens"),
        cumName = "_cum", rankName = "rk")
    val nShards = math.max(1L, (pf.totalSum + budgetTokens - 1) / budgetTokens)
    pf.df
      .select(col(idCol), col("tokens"),
        pmod(col("rk") - 1, lit(nShards)).as("shard"),
        lit(nShards).as("n_shards"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169):
    * score every document by the log-likelihood ratio of a TARGET
    * hashed bag-of-words model over a RAW model — the
    * domain-relevance score whose exponential is the importance weight
    * DSIR resamples by (compose with [[graft.operators.Shedding]]'s
    * weighted sampler, or cut a prefix with [[selectByBudget]]).
    *
    * Model: words hash into `numBuckets` buckets
    * (`pmod(strhash(w), B)`); the target model counts tokens of docs
    * matching `targetPred`, the raw model counts the rest; both are
    * add-one smoothed, so buckets unseen in one class still get finite
    * ratios. Per doc: Σ_buckets n(doc,b) · log(p_t(b) / p_r(b)).
    *
    * Cross-engine FP discipline: each bucket's log ratio is
    * ln( ((c_t+1)·(R+B)) / ((c_r+1)·(T+B)) ) with both products EXACT
    * long arithmetic (documented precondition: class tokens × class
    * tokens stays under 2^53 — hash-bucket models are built per corpus
    * SLICE long before that bound binds), ONE double divide and one
    * ln, quantized to DECIMAL(18,6); the per-doc score is then an
    * exact decimal dot product n·lr — order-independent, so shuffle
    * order can't move a bit.
    *
    * Scale shape: the corpus is tokenized ONCE into per-(doc, bucket)
    * counts (map-side combined — the exchange carries at most
    * min(doc_len, B) rows per doc, never raw tokens); the bucket
    * models re-aggregate THAT frame (B-row output), the log-ratio
    * table is a broadcast at any corpus size (B rows, fixed by
    * config), and the final per-doc sum partial-aggregates below its
    * exchange. Docs with zero words have no bucket rows and drop out
    * (mirrored by the oracle's unnest).
    *
    * Output: id, `is_target`, any `payloadCols` (doc attributes riding
    * the single scan — no second corpus join downstream), `n_tokens`,
    * `dsir_score` (double).
    */
  def dsirWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      numBuckets: Int = 1 << 12,
      payloadCols: Seq[String] = Nil,
      maxModelRows: Long = MaxBroadcastModelRows
  ): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    // the log-ratio model is one row per bucket — structurally ≤
    // numBuckets rows, so the broadcast bound is checkable at entry
    // with no count job (unlike the bigram/trigram members, whose
    // model size is data-dependent)
    require(numBuckets <= maxModelRows,
      s"dsirWeights: numBuckets=$numBuckets exceeds maxModelRows=$maxModelRows — " +
        "the bucket model broadcasts to every executor; lower numBuckets or " +
        "raise maxModelRows deliberately.")
    val bLit = lit(numBuckets.toLong)
    val payload = payloadCols.map(col)
    val db = graft.core.Fan.out(docs)
      .select(col(idCol) +: targetPred.as("is_target") +: payload :+
        explode(TextOps.words(col(textCol))).as("w"): _*)
      .groupBy(col(idCol) +: col("is_target") +: payload :+
        pmod(strhash(col("w")), bLit).as("b"): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // feeds both the bucket models and the scoring pass
    val model = db.groupBy(col("b")).agg(
      coalesce(sum(when(col("is_target"), col("n"))), lit(0L)).as("ct"),
      coalesce(sum(when(!col("is_target"), col("n"))), lit(0L)).as("cr"))
    val tot = model.agg(
      coalesce(sum(col("ct")), lit(0L)).as("t"),
      coalesce(sum(col("cr")), lit(0L)).as("r"))
    val lr = model.crossJoin(broadcast(tot))
      .select(col("b"),
        round(log(((col("ct") + 1L) * (col("r") + bLit)).cast("double") /
          ((col("cr") + 1L) * (col("t") + bLit)).cast("double")), 6)
          .cast("decimal(18,6)").as("lr"))
    db.join(broadcast(lr), Seq("b"))
      .groupBy(col(idCol) +: col("is_target") +: payload: _*)
      .agg(
        sum(col("n")).as("n_tokens"),
        sum(col("n") * col("lr")).cast("double").as("dsir_score"))
  }

  /** CCNet-style LM quality scoring (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", arXiv:1911.00359): score every document by the per-token
    * CROSS-ENTROPY of a hashed bag-of-words language model trained on
    * a REFERENCE slice (`refPred` — the wiki-like high-quality subset;
    * CCNet trains a KenLM there and buckets the crawl into
    * head/middle/tail by perplexity — cross-entropy is ln(ppl), the
    * same order, so thresholds translate directly). Companion to
    * [[dsirWeights]]: DSIR scores target-vs-raw contrast, this scores
    * absolute closeness to the reference distribution — the classic
    * quality filter.
    *
    * Model: words hash into `numBuckets` buckets; reference counts are
    * add-one smoothed over the bucket space, so buckets unseen in the
    * reference back off to the floor 1/(T+B) instead of -∞. Per doc:
    * ce = −Σ_b n(doc,b)·ln(p_ref(b)) / n_tokens.
    *
    * Cross-engine FP discipline (the [[dsirWeights]] pattern): each
    * bucket's log-prob is ln of ONE double division of exact long
    * operands ((c_b+1) / (T+B)), quantized round(6) → DECIMAL per
    * term; the per-doc dot product is an exact decimal sum, and the
    * final ce is one negation and one division of bit-identical
    * operands — so the raw double hash-matches. (Perplexity itself is
    * deliberately NOT emitted: exp of an aggregated double is the one
    * op whose last ulp may differ between engines' libm; callers
    * threshold in ln-space, which is order-identical.)
    *
    * Scale shape: identical to [[dsirWeights]] — the corpus tokenizes
    * ONCE into per-(doc, bucket) counts (map-side combined), the
    * reference model is a ≤B-row broadcast at any corpus size, and the
    * per-doc sum partial-aggregates below its exchange. Docs with zero
    * words drop out (no bucket rows — mirrored by the oracle's
    * unnest).
    *
    * Output: id, `is_ref`, any `payloadCols`, `n_tokens`,
    * `cross_entropy` (double, nats per token).
    */
  def lmCrossEntropy(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      refPred: Column,
      numBuckets: Int = 1 << 12,
      payloadCols: Seq[String] = Nil,
      maxModelRows: Long = MaxBroadcastModelRows
  ): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    // reference model is one row per bucket — structurally ≤ numBuckets
    // rows (see dsirWeights), so the bound checks at entry, jobless
    require(numBuckets <= maxModelRows,
      s"lmCrossEntropy: numBuckets=$numBuckets exceeds maxModelRows=$maxModelRows — " +
        "the reference model broadcasts to every executor; lower numBuckets or " +
        "raise maxModelRows deliberately.")
    val bLit = lit(numBuckets.toLong)
    val payload = payloadCols.map(col)
    val db = graft.core.Fan.out(docs)
      .select(col(idCol) +: refPred.as("is_ref") +: payload :+
        explode(TextOps.words(col(textCol))).as("w"): _*)
      .groupBy(col(idCol) +: col("is_ref") +: payload :+
        pmod(strhash(col("w")), bLit).as("b"): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // feeds the reference model and the scoring pass
    val model = db.filter(col("is_ref")).groupBy(col("b"))
      .agg(sum(col("n")).as("cb"))
    val tot = model.agg(coalesce(sum(col("cb")), lit(0L)).as("t"))
    val scored = db
      .join(broadcast(model), Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lp",
        round(log((coalesce(col("cb"), lit(0L)) + 1L).cast("double") /
          (col("t") + bLit).cast("double")), 6).cast("decimal(18,6)"))
    scored
      .groupBy(col(idCol) +: col("is_ref") +: payload: _*)
      .agg(
        sum(col("n")).as("n_tokens"),
        sum(col("n") * col("lp")).as("lps"))
      .select(col(idCol) +: col("is_ref") +: payload :+
        col("n_tokens") :+
        (-(col("lps").cast("double")) / col("n_tokens").cast("double"))
          .as("cross_entropy"): _*)
  }

  /** Interpolated-bigram cross-entropy — [[lmCrossEntropy]]'s model
    * upgraded one Markov order (the KenLM-direction step CCNet's real
    * scorer takes): each token scores under
    * `ln(λ·P_bg(w|prev) + (1−λ)·P_ug(w))` with add-one smoothing on
    * BOTH hashed models — `P_bg = (c(prev,w)+1)/(c(prev·)+B)`,
    * `P_ug = (c(w)+1)/(T+B)` — and `prev` of a document's first token
    * is the reserved start context (bucket id B, outside 0..B−1).
    *
    * Token adjacency is built IN ARRAY LAND: the words array zips with
    * its own 1-shifted self before the explode, so no per-doc window
    * shuffle exists — the only exchanges are the (doc, prev_b, w_b)
    * count aggregation and the model joins. Both models are
    * group-by-bucket aggregates of the SAME counted frame (one corpus
    * tokenization, localCheckpoint'd); at any corpus size the models
    * are ≤ B² + B rows — pick `numBuckets` so they broadcast, and the
    * finest model's row count is REQUIRED ≤ `maxModelRows` (one
    * control-plane count before the first broadcast — fail-loud, never
    * an executor OOM). λ and
    * 1−λ are driver-computed shared literals; per-token log-probs
    * quantize round(,6)→DECIMAL before the exact count-weighted sums
    * (the repo's transcendental-parity pattern).
    */
  def lmCrossEntropyBigram(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      refPred: Column,
      lambda: Double = 0.7,
      numBuckets: Int = 1 << 12,
      payloadCols: Seq[String] = Nil,
      maxModelRows: Long = MaxBroadcastModelRows
  ): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1), got $lambda")
    val bLit = lit(numBuckets.toLong)
    val payload = payloadCols.map(col)
    val ws = TextOps.words(col(textCol))
    // prev[i] = words[i-1]; prev[0] = NULL → start-context bucket B
    val prevArr = when(size(ws) > 0,
      concat(array(lit(null).cast("string")), slice(ws, lit(1), size(ws) - 1)))
      .otherwise(array().cast("array<string>"))
    val db = graft.core.Fan.out(docs)
      .select(col(idCol) +: refPred.as("is_ref") +: payload :+
        explode(arrays_zip(ws.as("w"), prevArr.as("p"))).as("z"): _*)
      .groupBy(col(idCol) +: col("is_ref") +: payload :+
        pmod(strhash(col("z.w")), bLit).as("wb") :+
        coalesce(pmod(strhash(col("z.p")), bLit), bLit).as("pb"): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // feeds both models and the scoring pass
    val ref = db.filter(col("is_ref"))
    val ug = ref.groupBy(col("wb").as("u_wb")).agg(sum(col("n")).as("cb"))
    val bg = ref.groupBy(col("pb").as("b_pb"), col("wb").as("b_wb"))
      .agg(sum(col("n")).as("c2"))
    val ctx = ref.groupBy(col("pb").as("c_pb")).agg(sum(col("n")).as("c1"))
    // bg is the FINEST model: ug and ctx are coarsenings of its group
    // keys, so one count bounds all three broadcasts below
    requireModelBroadcastable(bg, "lmCrossEntropyBigram", numBuckets, maxModelRows)
    val tot = ug.agg(coalesce(sum(col("cb")), lit(0L)).as("t"))
    val lamLit = lit(lambda)
    val omLit = lit(1.0 - lambda)
    val pBg = (coalesce(col("c2"), lit(0L)) + 1L).cast("double") /
      (coalesce(col("c1"), lit(0L)) + bLit).cast("double")
    val pUg = (coalesce(col("cb"), lit(0L)) + 1L).cast("double") /
      (col("t") + bLit).cast("double")
    val scored = db
      .join(broadcast(bg), col("pb") === col("b_pb") && col("wb") === col("b_wb"), "left")
      .join(broadcast(ctx), col("pb") === col("c_pb"), "left")
      .join(broadcast(ug), col("wb") === col("u_wb"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lp",
        round(log(lamLit * pBg + omLit * pUg), 6).cast("decimal(18,6)"))
    scored
      .groupBy(col(idCol) +: col("is_ref") +: payload: _*)
      .agg(
        sum(col("n")).as("n_tokens"),
        sum(col("n") * col("lp")).as("lps"))
      .select(col(idCol) +: col("is_ref") +: payload :+
        col("n_tokens") :+
        (-(col("lps").cast("double")) / col("n_tokens").cast("double"))
          .as("cross_entropy"): _*)
  }

  /** Interpolated-TRIGRAM cross-entropy — the Markov-order-2 member of
    * the [[lmCrossEntropy]] / [[lmCrossEntropyBigram]] ladder (CCNet's
    * real scorer is a 5-gram KenLM; each added order closes most of
    * the remaining gap): per token
    * `ln(λ3·P_tg + λ2·P_bg + (1−λ3−λ2)·P_ug)` with add-one smoothing
    * on all three hashed models — `P_tg = (c₃(pp,p,w)+1)/(c₂(pp,p)+B)`
    * and the lower orders as in the bigram. BOTH history slots of a
    * document's opening tokens take the reserved start context
    * (bucket B): position 1 has (pp, p) = (B, B), position 2
    * (B, hash(w₁)).
    *
    * Same exactness discipline as the bigram: shared λ literals
    * (BigDecimal plain-string renders in the oracle), per-token
    * log-prob round(,6)→DECIMAL, count-weighted exact decimal sums,
    * one closing division.
    *
    * Scale shape: token adjacency in array land (the words array zips
    * with its 1- and 2-shifted selves — no window shuffle), ONE
    * (doc, wb, pb, qb) counted exchange, and five broadcast model
    * joins. Model rows are bounded by the REFERENCE slice's distinct
    * hashed n-grams (≤ its token count, and ≤ B·B² absolutely) — at
    * corpus scale `numBuckets` is the knob that keeps the trigram
    * table broadcastable, the hashed-LM economy; the trigram table's
    * row count is REQUIRED ≤ `maxModelRows` (one control-plane count
    * before the first broadcast — fail-loud, never an executor OOM).
    */
  def lmCrossEntropyTrigram(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      refPred: Column,
      lambda3: Double = 0.5,
      lambda2: Double = 0.3,
      numBuckets: Int = 1 << 12,
      payloadCols: Seq[String] = Nil,
      maxModelRows: Long = MaxBroadcastModelRows
  ): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(lambda3 > 0 && lambda2 > 0 && lambda3 + lambda2 < 1,
      s"lambdas must be positive with lambda3 + lambda2 < 1, got $lambda3, $lambda2")
    val bLit = lit(numBuckets.toLong)
    val payload = payloadCols.map(col)
    val ws = TextOps.words(col(textCol))
    val nullS = lit(null).cast("string")
    val prev1 = when(size(ws) > 0,
      concat(array(nullS), slice(ws, lit(1), size(ws) - 1)))
      .otherwise(array().cast("array<string>"))
    val prev2 = when(size(ws) >= 2,
      concat(array(nullS, nullS), slice(ws, lit(1), size(ws) - 2)))
      .otherwise(when(size(ws) === 1, array(nullS))
        .otherwise(array().cast("array<string>")))
    val db = graft.core.Fan.out(docs)
      .select(col(idCol) +: refPred.as("is_ref") +: payload :+
        explode(arrays_zip(ws.as("w"), prev1.as("p"), prev2.as("q"))).as("z"): _*)
      .groupBy(col(idCol) +: col("is_ref") +: payload :+
        pmod(strhash(col("z.w")), bLit).as("wb") :+
        coalesce(pmod(strhash(col("z.p")), bLit), bLit).as("pb") :+
        coalesce(pmod(strhash(col("z.q")), bLit), bLit).as("qb"): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // feeds all five models and the scoring pass
    val ref = db.filter(col("is_ref"))
    val ug = ref.groupBy(col("wb").as("u_wb")).agg(sum(col("n")).as("cb"))
    val bg = ref.groupBy(col("pb").as("b_pb"), col("wb").as("b_wb"))
      .agg(sum(col("n")).as("c2"))
    val ctx1 = ref.groupBy(col("pb").as("c_pb")).agg(sum(col("n")).as("c1"))
    val tg = ref.groupBy(col("qb").as("t_qb"), col("pb").as("t_pb"), col("wb").as("t_wb"))
      .agg(sum(col("n")).as("c3"))
    val ctx2 = ref.groupBy(col("qb").as("d_qb"), col("pb").as("d_pb"))
      .agg(sum(col("n")).as("cc2"))
    // tg is the FINEST model: ug/bg/ctx1/ctx2 all coarsen its group
    // keys, so one count bounds all five broadcasts below
    requireModelBroadcastable(tg, "lmCrossEntropyTrigram", numBuckets, maxModelRows)
    val tot = ug.agg(coalesce(sum(col("cb")), lit(0L)).as("t"))
    val l3Lit = lit(lambda3)
    val l2Lit = lit(lambda2)
    val l1Lit = lit(1.0 - lambda3 - lambda2)
    val pTg = (coalesce(col("c3"), lit(0L)) + 1L).cast("double") /
      (coalesce(col("cc2"), lit(0L)) + bLit).cast("double")
    val pBg = (coalesce(col("c2"), lit(0L)) + 1L).cast("double") /
      (coalesce(col("c1"), lit(0L)) + bLit).cast("double")
    val pUg = (coalesce(col("cb"), lit(0L)) + 1L).cast("double") /
      (col("t") + bLit).cast("double")
    val scored = db
      .join(broadcast(tg),
        col("qb") === col("t_qb") && col("pb") === col("t_pb") &&
          col("wb") === col("t_wb"), "left")
      .join(broadcast(ctx2),
        col("qb") === col("d_qb") && col("pb") === col("d_pb"), "left")
      .join(broadcast(bg), col("pb") === col("b_pb") && col("wb") === col("b_wb"), "left")
      .join(broadcast(ctx1), col("pb") === col("c_pb"), "left")
      .join(broadcast(ug), col("wb") === col("u_wb"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lp",
        round(log(l3Lit * pTg + l2Lit * pBg + l1Lit * pUg), 6).cast("decimal(18,6)"))
    scored
      .groupBy(col(idCol) +: col("is_ref") +: payload: _*)
      .agg(
        sum(col("n")).as("n_tokens"),
        sum(col("n") * col("lp")).as("lps"))
      .select(col(idCol) +: col("is_ref") +: payload :+
        col("n_tokens") :+
        (-(col("lps").cast("double")) / col("n_tokens").cast("double"))
          .as("cross_entropy"): _*)
  }

  /** Interpolated Kneser–Ney bigram cross-entropy — the smoothing the
    * CCNet-class perplexity filters actually run (Kneser & Ney 1995;
    * Chen & Goodman 1999's interpolated form): instead of add-one
    * mass spread uniformly, each bigram's count is ABSOLUTELY
    * DISCOUNTED by `discount` and the freed mass backs off to the
    * CONTINUATION distribution — how many distinct contexts a word
    * completes, not how often it occurs ("Francisco" is frequent but
    * only ever follows "San", so its continuation probability is
    * tiny). Per token, with all counts from the reference slice:
    *
    *   P(w|p) = max(c(p,w) − D, 0)/c(p·) + D·N₁₊(p·)/c(p·) · Pc(w)
    *   Pc(w)  = (N₁₊(·w) + 1) / (N₁₊(··) + B)
    *
    * where N₁₊(p·) = distinct words following p, N₁₊(·w) = distinct
    * contexts preceding w, N₁₊(··) = total distinct bigram types —
    * the +1/+B add-one on the continuation model keeps unseen buckets
    * finite (the hashed-vocabulary analog of KN's unigram floor). A
    * context unseen in the reference backs off to Pc(w) alone.
    *
    * Cross-engine FP discipline (the [[lmCrossEntropyBigram]]
    * pattern): every count is an exact long; the per-token probability
    * is a FIXED sequence of IEEE double ops — one divide for Pc, a
    * subtract/max/divide for the discounted term, a multiply-divide
    * for the back-off weight λ(p) = D·N₁₊(p·)/c(p·), one
    * multiply-add — mirrored op-for-op by the oracle, then
    * round(,6)→DECIMAL before the exact count-weighted sum. `discount`
    * renders as a shared plain-string literal in both engines.
    *
    * Scale shape: identical to [[lmCrossEntropyBigram]] — adjacency in
    * array land, ONE counted (doc, wb, pb) exchange, and the bigram
    * type table (the finest model — the context and continuation
    * tables are its group-by coarsenings, computed FROM it so the
    * type counts stay consistent) broadcast under the
    * [[MaxBroadcastModelRows]] fail-loud bound.
    */
  def lmCrossEntropyKneserNey(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      refPred: Column,
      discount: Double = 0.75,
      numBuckets: Int = 1 << 12,
      payloadCols: Seq[String] = Nil,
      maxModelRows: Long = MaxBroadcastModelRows
  ): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1), got $discount")
    val bLit = lit(numBuckets.toLong)
    val payload = payloadCols.map(col)
    val ws = TextOps.words(col(textCol))
    val prevArr = when(size(ws) > 0,
      concat(array(lit(null).cast("string")), slice(ws, lit(1), size(ws) - 1)))
      .otherwise(array().cast("array<string>"))
    val db = graft.core.Fan.out(docs)
      .select(col(idCol) +: refPred.as("is_ref") +: payload :+
        explode(arrays_zip(ws.as("w"), prevArr.as("p"))).as("z"): _*)
      .groupBy(col(idCol) +: col("is_ref") +: payload :+
        pmod(strhash(col("z.w")), bLit).as("wb") :+
        coalesce(pmod(strhash(col("z.p")), bLit), bLit).as("pb"): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // feeds the bigram type table and the scoring pass
    // ALL models derive from the bigram type table so token counts and
    // type counts stay consistent: ctx = row-sums + distinct-word
    // counts per context, cont = distinct-context counts per word,
    // tot = the type total
    val bg = db.filter(col("is_ref"))
      .groupBy(col("pb").as("b_pb"), col("wb").as("b_wb"))
      .agg(sum(col("n")).as("c2"))
      .localCheckpoint(false) // feeds ctx/cont/tot AND the scoring join
    requireModelBroadcastable(bg, "lmCrossEntropyKneserNey", numBuckets, maxModelRows)
    val ctx = bg.groupBy(col("b_pb").as("c_pb"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1p"))
    val cont = bg.groupBy(col("b_wb").as("u_wb")).agg(count(lit(1)).as("n1s"))
    val tot = bg.agg(coalesce(count(lit(1)), lit(0L)).as("nt"))
    val dLit = lit(discount)
    val pc = (coalesce(col("n1s"), lit(0L)) + 1L).cast("double") /
      (col("nt") + bLit).cast("double")
    val c1d = col("c1").cast("double")
    val t1 = greatest(coalesce(col("c2"), lit(0L)).cast("double") - dLit, lit(0.0)) / c1d
    val lam = dLit * col("n1p").cast("double") / c1d
    val p = when(col("c1").isNotNull, t1 + lam * pc).otherwise(pc)
    val scored = db
      .join(broadcast(bg), col("pb") === col("b_pb") && col("wb") === col("b_wb"), "left")
      .join(broadcast(ctx), col("pb") === col("c_pb"), "left")
      .join(broadcast(cont), col("wb") === col("u_wb"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lp", round(log(p), 6).cast("decimal(18,6)"))
    scored
      .groupBy(col(idCol) +: col("is_ref") +: payload: _*)
      .agg(
        sum(col("n")).as("n_tokens"),
        sum(col("n") * col("lp")).as("lps"))
      .select(col(idCol) +: col("is_ref") +: payload :+
        col("n_tokens") :+
        (-(col("lps").cast("double")) / col("n_tokens").cast("double"))
          .as("cross_entropy"): _*)
  }

  /** Interpolated Kneser–Ney TRIGRAM cross-entropy — the ladder's
    * order-3 member ([[lmCrossEntropyKneserNey]] one Markov order up,
    * Chen & Goodman 1999 §3's interpolated KN at the order real
    * CCNet-class scorers approach): the highest order discounts RAW
    * counts, every lower order discounts CONTINUATION TYPE counts —
    * "how many distinct contexts complete this way", the KN insight
    * applied recursively:
    *
    *   P(w|q,p)  = max(c₃(qpw) − D, 0)/c₂(qp·) + D·N₁₊(qp·)/c₂(qp·) · P₂(w|p)
    *   P₂(w|p)   = max(N₁₊(·pw) − D, 0)/N₁₊(·p·) + D·N₁₊(p·)/N₁₊(·p·) · Pc(w)
    *   Pc(w)     = (N₁₊(·w) + 1) / (N₁₊(··) + B)
    *
    * with an unseen (q,p) context backing off to P₂ and an unseen p to
    * Pc. ALL count tables derive from the trigram TYPE table (mid =
    * distinct-q counts per (p,w); its coarsenings give every N₁₊), so
    * type/token counts stay consistent and ONE count guards all six
    * broadcasts ([[MaxBroadcastModelRows]]).
    *
    * Cross-engine FP discipline: the [[lmCrossEntropyKneserNey]]
    * sequence applied twice — each order is subtract/max/divide plus a
    * multiply-divide back-off weight and one multiply-add, every
    * operand an exact long, mirrored op-for-op by the oracle, then
    * round(,6)→DECIMAL per token and exact count-weighted sums.
    *
    * Scale shape: the trigram tokenize of [[lmCrossEntropyTrigram]]
    * (adjacency in array land, ONE counted exchange) + six broadcast
    * model joins, models bounded by the reference slice's distinct
    * hashed trigrams.
    */
  def lmCrossEntropyKneserNeyTrigram(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      refPred: Column,
      discount: Double = 0.75,
      numBuckets: Int = 1 << 12,
      payloadCols: Seq[String] = Nil,
      maxModelRows: Long = MaxBroadcastModelRows
  ): DataFrame = {
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    require(discount > 0 && discount < 1,
      s"discount must be in (0,1), got $discount")
    val bLit = lit(numBuckets.toLong)
    val payload = payloadCols.map(col)
    val ws = TextOps.words(col(textCol))
    val nullS = lit(null).cast("string")
    val prev1 = when(size(ws) > 0,
      concat(array(nullS), slice(ws, lit(1), size(ws) - 1)))
      .otherwise(array().cast("array<string>"))
    val prev2 = when(size(ws) >= 2,
      concat(array(nullS, nullS), slice(ws, lit(1), size(ws) - 2)))
      .otherwise(when(size(ws) === 1, array(nullS))
        .otherwise(array().cast("array<string>")))
    val db = graft.core.Fan.out(docs)
      .select(col(idCol) +: refPred.as("is_ref") +: payload :+
        explode(arrays_zip(ws.as("w"), prev1.as("p"), prev2.as("q"))).as("z"): _*)
      .groupBy(col(idCol) +: col("is_ref") +: payload :+
        pmod(strhash(col("z.w")), bLit).as("wb") :+
        coalesce(pmod(strhash(col("z.p")), bLit), bLit).as("pb") :+
        coalesce(pmod(strhash(col("z.q")), bLit), bLit).as("qb"): _*)
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(false) // feeds the trigram type table and the scoring pass
    val tg = db.filter(col("is_ref"))
      .groupBy(col("qb").as("t_qb"), col("pb").as("t_pb"), col("wb").as("t_wb"))
      .agg(sum(col("n")).as("c3"))
      .localCheckpoint(false) // feeds every lower-order table AND the scoring join
    requireModelBroadcastable(tg, "lmCrossEntropyKneserNeyTrigram", numBuckets, maxModelRows)
    val ctx2 = tg.groupBy(col("t_qb").as("d_qb"), col("t_pb").as("d_pb"))
      .agg(sum(col("c3")).as("cc2"), count(lit(1)).as("n1p3"))
    // middle order: continuation TYPE counts — distinct left contexts
    // q per (p, w), then its row/level coarsenings
    val mid = tg.groupBy(col("t_pb").as("m_pb"), col("t_wb").as("m_wb"))
      .agg(count(lit(1)).as("c2p"))
      .localCheckpoint(false) // feeds midctx/cont/tot AND the scoring join
    val midctx = mid.groupBy(col("m_pb").as("x_pb"))
      .agg(sum(col("c2p")).as("m1"), count(lit(1)).as("n1pw"))
    val cont = mid.groupBy(col("m_wb").as("u_wb")).agg(count(lit(1)).as("n1s"))
    val tot = mid.agg(count(lit(1)).as("nt"))
    val dLit = lit(discount)
    val pc = (coalesce(col("n1s"), lit(0L)) + 1L).cast("double") /
      (col("nt") + bLit).cast("double")
    val m1d = col("m1").cast("double")
    val p2 = when(col("m1").isNotNull,
      greatest(coalesce(col("c2p"), lit(0L)).cast("double") - dLit, lit(0.0)) / m1d +
        dLit * col("n1pw").cast("double") / m1d * pc)
      .otherwise(pc)
    val cc2d = col("cc2").cast("double")
    val p3 = when(col("cc2").isNotNull,
      greatest(coalesce(col("c3"), lit(0L)).cast("double") - dLit, lit(0.0)) / cc2d +
        dLit * col("n1p3").cast("double") / cc2d * p2)
      .otherwise(p2)
    val scored = db
      .join(broadcast(tg),
        col("qb") === col("t_qb") && col("pb") === col("t_pb") &&
          col("wb") === col("t_wb"), "left")
      .join(broadcast(ctx2),
        col("qb") === col("d_qb") && col("pb") === col("d_pb"), "left")
      .join(broadcast(mid),
        col("pb") === col("m_pb") && col("wb") === col("m_wb"), "left")
      .join(broadcast(midctx), col("pb") === col("x_pb"), "left")
      .join(broadcast(cont), col("wb") === col("u_wb"), "left")
      .crossJoin(broadcast(tot))
      .withColumn("lp", round(log(p3), 6).cast("decimal(18,6)"))
    scored
      .groupBy(col(idCol) +: col("is_ref") +: payload: _*)
      .agg(
        sum(col("n")).as("n_tokens"),
        sum(col("n") * col("lp")).as("lps"))
      .select(col(idCol) +: col("is_ref") +: payload :+
        col("n_tokens") :+
        (-(col("lps").cast("double")) / col("n_tokens").cast("double"))
          .as("cross_entropy"): _*)
  }

  /** The DSIR resampling step: draw `k` docs PER `groupCol` slice,
    * without replacement, with probability proportional to the
    * exponentiated [[dsirWeights]] score — via the Gumbel top-k
    * identity (key = score + Gumbel(0,1), take the k largest), which
    * never materializes exp(score) and so never overflows however
    * confident the score. The Gumbel draw rides the repo's
    * deterministic squared-hash uniform, so both engines select the
    * same set; ranking runs on [[graft.plans.TopKPerKey]] (per-key
    * heaps, never a global window).
    */
  def dsirResample(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      targetPred: Column,
      k: Int,
      numBuckets: Int = 1 << 12
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val scored = dsirWeights(docs, idCol, textCol, targetPred, numBuckets,
      payloadCols = Seq(groupCol))
    val h = strhash(concat(lit("dsir:"), col(idCol).cast("string")))
    val u = (pmod(h * h, lit(1000000007L)) + lit(1L)).cast("double") / lit(1000000008.0)
    val keyed = scored.withColumn("g_key", col("dsir_score") + -log(-log(u)))
    graft.plans.TopKPerKey(
      spark, keyed, Seq(groupCol), Seq("g_key" -> true, idCol -> false), k)
      .drop("g_key")
  }

  /** Greedy maximum-coverage selection (Nemhauser et al. 1978's
    * (1 − 1/e) greedy): pick `k` documents that together cover the
    * most DISTINCT shingles — the coverage-driven data-selection
    * policy (diversity by construction: a doc near-duplicating an
    * already-chosen one has near-zero marginal gain, so greedy
    * coverage subsumes a dedup pass). Ties break toward the smaller
    * doc id; rounds stop early once everything is covered.
    *
    * Output, one row per chosen doc: `(round, doc, gain,
    * covered_total)` — the marginal distinct-shingle gain and the
    * running coverage.
    *
    * Scale shape: greedy is INHERENTLY sequential — k rounds, each one
    * anti-join + map-side-combined aggregate over the checkpointed
    * (doc, shingle) table, with exactly ONE winner row collected per
    * round (control-plane sized; the covered set stays distributed,
    * growing behind per-round lazy checkpoints that also cap lineage).
    * The k-scan cost is the honest price of the greedy guarantee; the
    * at-scale knob is k, not the corpus.
    */
  def greedyCoverage(
      spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int
  ): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    require(k > 0, s"k must be positive, got $k")
    val sh = graft.core.Fan.out(docs)
      .select(col(idCol).as("doc"), explode(TextOps.shingleHashes(col(textCol))).as("h"))
      .localCheckpoint(false) // scanned once per round — materialize the tokenize
    var covered = spark.createDataFrame(
      java.util.Collections.emptyList[Row](),
      StructType(Seq(StructField("h", LongType, nullable = false))))
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var total = 0L
    var exhausted = false
    for (r <- 1 to k if !exhausted) {
      val win = sh.join(covered, Seq("h"), "left_anti")
        .groupBy(col("doc")).agg(count(lit(1)).as("gain"))
        .orderBy(col("gain").desc, col("doc"))
        .limit(1).collect()
      if (win.isEmpty) exhausted = true
      else {
        val doc = win.head.getLong(0)
        val gain = win.head.getLong(1)
        total += gain
        out += Row(r.toLong, doc, gain, total)
        covered = org.apache.spark.sql.graft.Bridge.resetStats(covered
          .unionAll(sh.filter(col("doc") === doc).select(col("h")))
          .distinct()
          .localCheckpoint(false)) // resetStats: k rounds of self-union
          // would compound origin stats (the louvain driver-wedge lesson)
      }
    }
    // explicit-schema createDataFrame (repo invariant: no case-class
    // toDF for driver-side constants)
    spark.createDataFrame(
      java.util.Arrays.asList(out.toSeq: _*),
      StructType(Seq(
        StructField("round", LongType, nullable = false),
        StructField("doc", LongType, nullable = false),
        StructField("gain", LongType, nullable = false),
        StructField("covered_total", LongType, nullable = false))))
  }

  /** Deterministic contrastive negative sampling — the pair-builder a
    * contrastive/embedding training run needs (in-batch negatives made
    * reproducible): for every anchor row, `k` negatives drawn from a
    * SHARED hash-selected candidate pool, excluding the anchor itself
    * and its own label class. Both draws are pure functions of the
    * ids (the squared-strhash uniformizer — sequential ids sample
    * uniformly), so resharding, re-running, or replaying in DuckDB
    * yields the identical pairs.
    *
    * Scale shape: the pool is the bottom-`poolSize` rows by pool hash
    * — one TakeOrderedAndProject, never a global sort — and the
    * anchor × pool expansion rides a BROADCAST of those `poolSize`
    * rows (anchors × poolSize work, the quadratic is capped by the
    * pool knob, never anchors × corpus); the per-anchor top-k is a
    * window over ≤ poolSize rows keyed by the anchor. A label-skewed
    * corpus can starve a class (pool members all share its label) —
    * size the pool a few multiples of k · classes.
    *
    * Output: (anchor, rank, neg_id, neg_label), rank 1..≤k by the
    * pair hash (ties to the smaller candidate id).
    */
  def negativeSamples(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      k: Int,
      poolSize: Int
  ): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(poolSize >= k, s"poolSize must be >= k, got $poolSize vs $k")
    val p = graft.functions.StrHash.P
    def sqHash(salt: String, c: Column): Column = {
      val h = graft.functions.GraftFunctions.strhash(
        concat(lit(salt), c.cast("string")))
      pmod(h * h, lit(p))
    }
    val pool = df
      .select(col(idCol).as("neg_id"), col(labelCol).as("neg_label"),
        sqHash("negp:", col(idCol)).as("pk"))
      .orderBy(col("pk"), col("neg_id"))
      .limit(poolSize)
      .select(col("neg_id"), col("neg_label"))
    val anchors = df.select(col(idCol).as("anchor"), col(labelCol).as("_albl"))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor")).orderBy(col("qk"), col("neg_id"))
    // anchors × pool via crossJoin(broadcast(...)) — the IvfIndex
    // quantization precedent: the nested loop is over the POOL KNOB
    // (≤ poolSize rows), never the corpus
    anchors
      .crossJoin(broadcast(pool))
      .filter(col("anchor") =!= col("neg_id") && !(col("_albl") <=> col("neg_label")))
      .withColumn("qk",
        sqHash("negq:", concat(col("anchor").cast("string"), lit(":"),
          col("neg_id").cast("string"))))
      .withColumn("rank", row_number().over(rk).cast("long"))
      .filter(col("rank") <= k)
      .select(col("anchor"), col("rank"), col("neg_id"), col("neg_label"))
  }
}
