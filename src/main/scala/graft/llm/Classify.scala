package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus classification: multinomial Naive Bayes trained and scored
  * entirely in-engine — the "quality classifier" stage of the
  * GPT-3/CCNet-era curation recipe (score every document against a
  * labeled reference, keep/weight by the posterior) without any
  * external model artifact. Training is closed-form counting, so the
  * whole train→score pipeline is one lazy plan with an exact DuckDB
  * oracle.
  *
  * Reference scope: ralf's operator chains transform feature tables
  * (`ralf/operator.py:60-118`); a learned filter is the same
  * map-with-state shape where the "state" is the broadcast-free model
  * table. The NB formulation follows McCallum & Nigam 1998 (multinomial
  * event model, Laplace smoothing).
  *
  * Cross-engine FP discipline: every transcendental lands once per
  * MODEL ROW, not per document — `ln` of a rational built from exact
  * long counts, rounded to 6 decimals and quantized to DECIMAL(18,6)
  * (the decayedSum pattern). Per-document scores are then
  * `lprior + Σ tf·llh` — integer × decimal products summed exactly, so
  * shuffle order cannot move a bit and the argmax is engine-identical.
  * Ties (same total score) break toward the lexicographically smaller
  * label in both engines.
  *
  * Scale shape: the text-bearing scan happens ONCE (the explode under
  * the (doc, label, term) exchange, map-side combined, then a
  * localCheckpoint barrier so the token table feeds training counts AND
  * scoring without re-tokenizing). The dense model is classes × vocab
  * rows — vocabulary-sized, so the scoring join on `term` carries NO
  * broadcast hint (web vocabularies are billions of terms; both sides
  * descend from the same token table and AQE broadcasts small ones at
  * runtime). Only genuinely constant-size frames broadcast: the
  * per-class totals, the priors, the vocab-size scalar, and the
  * prior-only fallback row for token-less documents.
  */
object Classify {

  /** Train a multinomial NB model on `docs` (every row labeled by
    * `labelCol`) and score the SAME corpus, emitting one row per
    * document: `(doc, actual, pred, score)` with `score` the winning
    * class's log-posterior (up to the shared evidence constant).
    *
    * Semantics (alpha-Laplace, alpha = 1):
    *   lprior(c)  = ln(N_c / N)
    *   llh(c, t)  = ln((cnt(c, t) + 1) / (tokens(c) + |V|)),  t ∈ V
    *   score(d,c) = lprior(c) + Σ_{t ∈ d ∩ V} tf(d, t) · llh(c, t)
    * Out-of-vocabulary terms at score time are ignored (the standard
    * multinomial-NB OOV policy). `minDf` prunes V to terms appearing in
    * at least that many documents (df off the already-checkpointed
    * token table): class token totals restrict to the kept vocabulary
    * (the model stays a proper distribution over V), pruned terms
    * simply have no model rows, so the OOV policy drops them at score
    * time for free. At `minDf = 1` the code path — and therefore the
    * plan and the oracle hash — is byte-identical to the unpruned
    * operator. Documents with no in-vocabulary tokens fall back to the
    * highest-prior class (tie toward the smaller label) with score =
    * that prior — the operator never drops a document.
    *
    * Exchange volume note: the dense model means the scoring join on
    * `term` fans every (doc, term) row by |classes| before the
    * per-(doc, label) aggregate — fine at realistic label counts
    * (2–100), and `minDf` is the lever when it isn't: pruning the
    * long-tail vocabulary shrinks the model AND the tokens × classes
    * fan-out together (tail terms are most of V but few of the
    * postings that survive pruning).
    *
    * Contract: labels must be non-NULL. A NULL label would form its
    * own class whose ORDER position differs between engines (Spark
    * sorts NULLS FIRST ascending, DuckDB NULLS LAST), silently
    * breaking the argmax tie-break — label your corpus (or filter)
    * before training.
    */
  def nbTrainScore(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      minDf: Int = 1
  ): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    val base = docs.select(
      col(idCol).as("doc"), col(labelCol).as("actual"),
      TextOps.words(col(textCol)).as("ws"))

    // the one text-bearing stage — barrier so counts and scoring share it
    val tf = base
      .select(col("doc"), col("actual"), explode(col("ws")).as("term"))
      .groupBy(col("doc"), col("actual"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)

    val classTermAll = tf.groupBy(col("actual").as("label"), col("term"))
      .agg(sum(col("tf")).as("cnt"))
      .localCheckpoint(false) // feeds totals, vocab AND the dense model
    // minDf = 1 keeps the unpruned path verbatim (identical plan);
    // otherwise df counts off the checkpointed token table gate both
    // the vocabulary and the class-term counts
    val (classTerm, vocab) =
      if (minDf <= 1) (classTermAll, classTermAll.select(col("term")).distinct())
      else {
        val kept = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
          .filter(col("df") >= minDf)
          .select(col("term"))
          .localCheckpoint(false) // feeds the count prune AND the model spine
        (classTermAll.join(kept, Seq("term")), kept)
      }
    val vSize = vocab.agg(count(lit(1)).as("v"))

    val nDocs = base.agg(count(lit(1)).as("n"))
    val priors = base.groupBy(col("actual").as("label"))
      .agg(count(lit(1)).as("n_c"))
      .crossJoin(broadcast(nDocs))
      .select(col("label"),
        round(log(col("n_c").cast("double") / col("n").cast("double")), 6)
          .cast("decimal(18,6)").as("lp"))
      .localCheckpoint(false) // tiny; feeds the model AND the fallback row

    // per-class token totals over V. Pruning can empty a class's kept
    // counts entirely — it must still smooth (tot = 0), so the pruned
    // branch spines totals off the full label set; the unpruned branch
    // keeps its original one-aggregate shape (identical plan at minDf=1)
    val classSums = classTerm.groupBy(col("label")).agg(sum(col("cnt")).as("tot"))
    val classTot =
      if (minDf <= 1) classSums
      else priors.select(col("label"))
        .join(classSums.withColumnRenamed("tot", "_t"), Seq("label"), "left")
        .select(col("label"), coalesce(col("_t"), lit(0L)).as("tot"))

    // dense model: every (class, vocab-term) pair — zero counts smooth
    // to alpha/(tot + V). classTot is classes-sized: broadcast; vocab
    // rides as the big side.
    val model = vocab
      .crossJoin(broadcast(classTot))
      .join(classTerm, Seq("label", "term"), "left")
      .crossJoin(broadcast(vSize))
      .select(col("label"), col("term"),
        round(log(
          (coalesce(col("cnt"), lit(0L)).cast("double") + 1.0) /
            (col("tot").cast("double") + col("v").cast("double"))), 6)
          .cast("decimal(18,6)").as("llh"))

    // score: each doc term meets every class's row for that term
    val scored = tf
      .join(model, Seq("term")) // vocab-keyed — no broadcast hint (see scaladoc)
      .groupBy(col("doc"), col("label"))
      .agg(sum(col("tf") * col("llh")).as("tsum"))
      .join(broadcast(priors), Seq("label"))
      .select(col("doc"), col("label"), (col("lp") + col("tsum")).as("total"))
    val win = row_number().over(
      Window.partitionBy(col("doc")).orderBy(col("total").desc, col("label")))
    val best = scored.withColumn("rk", win).filter(col("rk") === 1)
      .select(col("doc"), col("label").as("pred_t"), col("total"))

    // prior-only fallback for token-less docs: one row via
    // TakeOrderedAndProject (a partitionless window would trip the
    // EliminateWindowPartitions/WindowExec hazard — repo invariant)
    val fallback = priors.orderBy(col("lp").desc, col("label")).limit(1)
      .select(col("label").as("fb_label"), col("lp").as("fb_lp"))

    base.select(col("doc"), col("actual"))
      .join(best, Seq("doc"), "left")
      .crossJoin(broadcast(fallback))
      .select(
        col("doc"), col("actual"),
        coalesce(col("pred_t"), col("fb_label")).as("pred"),
        coalesce(col("total").cast("double"), col("fb_lp").cast("double")).as("score"))
  }
}
