package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.strhash

/** Domain-mixture weighting: allocate a training token budget across
  * corpus slices (sources / domains / languages) by temperature-scaled
  * size — the standard pretraining-mix recipe (weight ∝ tokensᵅ with
  * α < 1 up-weights small, high-value slices relative to raw
  * proportional sampling; α = 0.5 is the common square-root
  * temperature).
  *
  * Cross-engine FP discipline (the oracle hash-matches bit-for-bit):
  * per-slice √tokens is one correctly-rounded IEEE op, quantized to
  * DECIMAL(18,6) BEFORE the corpus-wide sum — so the normalizer is
  * exact decimal arithmetic, order-independent — and every downstream
  * double (weight, allocation, epochs) is a short chain of identical
  * IEEE ops on identical operands, never rounded mid-chain.
  *
  * Scale shape: one aggregate keyed by the slice (map-side combine; a
  * slice count is 10²–10³, constant next to the corpus), a single-row
  * broadcast for the normalizer, then pure per-row arithmetic. The big
  * table is touched exactly once.
  */
object Mixture {

  /** Per-slice token-budget allocation at square-root temperature.
    *
    * Output per slice: `n_docs`, `tokens` (actual), `weight`
    * (normalized √tokens), `alloc_tokens` (⌊budget·weight⌋) and
    * `epochs` (allocation / actual — >1 means the slice repeats).
    *
    * @param tokensCol per-document token count expression
    */
  def temperatureWeights(
      docs: DataFrame,
      groupCol: String,
      tokensCol: Column,
      budgetTokens: Long
  ): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val per = docs
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol.cast("long")).as("tokens"))
      .withColumn("w_d", round(sqrt(col("tokens").cast("double")), 6).cast("decimal(18,6)"))
      // barrier: the normalizer collect below and the returned frame
      // both read the slice-sized materialized blocks — one corpus scan
      .localCheckpoint(false)
    // the normalizer is ONE scalar: collect it (decimal→double cast
    // runs IN-ENGINE, so the literal is bit-identical to the column it
    // replaces) and re-enter it — the Association.rules convention; the
    // former crossJoin(broadcast(oneRowAgg)) planned a 1-row
    // BroadcastNestedLoopJoin
    val wTot = per.agg(coalesce(sum(col("w_d")).cast("double"), lit(0.0)))
      .collect()(0).getDouble(0)
    // zero guards (mirrored in the oracle): a slice whose documents all
    // have 0 tokens gets weight 0 (not 0/0 = NaN epochs), and an
    // all-empty corpus (w_tot = 0) gets all-zero weights instead of
    // NaN propagating into downstream budget math
    val weight = if (wTot > 0.0) col("w_d").cast("double") / lit(wTot) else lit(0.0)
    val alloc = floor(lit(budgetTokens).cast("double") * weight)
    per
      .select(
        col("grp"),
        col("n_docs"),
        col("tokens"),
        weight.as("weight"),
        alloc.cast("long").as("alloc_tokens"),
        when(col("tokens") > 0L, alloc / col("tokens").cast("double"))
          .otherwise(lit(0.0)).as("epochs"))
  }

  /** UniMax budget allocation (Chung et al. 2023): waterfill the token
    * budget UNIFORMLY across slices, capping each slice at `maxEpochs`
    * repeats of its actual tokens — the fairness-first alternative to
    * temperature sampling (a slice never repeats more than the epoch
    * cap however small it is, and no slice dominates however big).
    * Every slice gets min(cap, θ) tokens where the water level θ
    * spreads the remaining budget evenly over the uncapped slices.
    *
    * Determinism discipline: the SATURATION DECISION is pure integer
    * arithmetic — slice (by ascending (cap, grp)) saturates iff
    * cap·(slices remaining) < budget − (saturated-cap prefix), all
    * longs — and θ is ONE double division of exact long operands, so
    * both engines agree bit-for-bit with no mid-chain rounding.
    *
    * Scale shape: one aggregate keyed by the slice touches the corpus
    * once; the (cap, grp)-ascending prefix/rank then runs the
    * [[Selection.selectByBudget]] two-pass machinery — range-repartition
    * + in-partition sort, per-partition (count, cap-sum) totals to the
    * driver (two longs per partition — control-plane at any slice
    * count), offsets broadcast back — never a single-partition global
    * window, and never the O(slices²) triangle join this used before
    * round 7 (a per-domain web mixture has 10⁵–10⁶ slices, where
    * 10¹⁰⁺ pairs through a nested-loop join is a wall; PlanSpec pins
    * the nested-loop's absence). The saturation totals and the water
    * level collapse to TWO driver-side longs (θ stays the same single
    * double division, just evaluated once on the driver).
    */
  def unimaxAllocation(
      docs: DataFrame,
      groupCol: String,
      tokensCol: Column,
      budgetTokens: Long,
      maxEpochs: Int
  ): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    require(maxEpochs > 0, s"maxEpochs must be positive, got $maxEpochs")
    val per = docs
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol.cast("long")).as("tokens"))
      .withColumn("cap", col("tokens") * maxEpochs)
    val pf = graft.core.GlobalOrder
      .withPrefix(per, Seq(col("cap").asc, col("grp").asc), col("cap"),
        cumName = "_cum", rankName = "_rk")
    // exclusive prefix / 0-based rank from the inclusive pair; integer
    // saturation test — the capped set is a prefix of the (cap, grp)
    // order, so the water level is shared by every survivor
    val flagged = pf.df
      .withColumn("prefix", col("_cum") - col("cap"))
      .withColumn("nbelow", col("_rk") - lit(1L))
      .withColumn("capped",
        col("cap") * (lit(pf.totalRows) - col("nbelow")) < lit(budgetTokens) - col("prefix"))
      .localCheckpoint(false) // feeds the saturation totals + the output
    val Seq(satTokens, nUncapped) = {
      val r = flagged.agg(
        coalesce(sum(when(col("capped"), col("cap"))), lit(0L)),
        coalesce(sum(when(col("capped"), lit(0L)).otherwise(lit(1L))), lit(0L))).head()
      Seq(r.getLong(0), r.getLong(1))
    }
    // θ: ONE double division of exact long operands (driver-evaluated;
    // unused — and possibly non-finite — when every slice saturates)
    val theta = lit((budgetTokens - satTokens).toDouble / nUncapped.toDouble)
    val alloc = when(col("capped"), col("cap").cast("double")).otherwise(theta)
    flagged
      .select(
        col("grp"),
        col("n_docs"),
        col("tokens"),
        col("cap").as("cap_tokens"),
        alloc.as("alloc_tokens"),
        when(col("tokens") > 0L, alloc / col("tokens").cast("double"))
          .otherwise(lit(0.0)).as("epochs"))
  }

  /** EXECUTE a mixture allocation: emit every document of slice g
    * `epochs(g)` times — `floor(epochs)` full repeats, plus one more
    * with probability `frac(epochs)` decided per doc by the
    * deterministic squared-hash uniform — turning the
    * [[temperatureWeights]] / [[unimaxAllocation]] tables into the
    * actual repeated training stream. Expected token mass per slice
    * equals the allocation; the draw is engine-replayable, so the
    * exact emitted multiset is reproducible anywhere.
    *
    * `alloc` is any frame with (`grp`, `epochs`) — the output shape of
    * both allocators. Scale shape: the allocation is slice-sized and
    * BROADCAST; the repeat is a narrow explode of sequence(1, n) — the
    * corpus is scanned once and nothing shuffles. Determinism: epochs
    * arrives as one double identical in both engines; floor/frac/
    * compare are identical IEEE ops on it.
    *
    * Output: id, group, `n_reps`, `rep` (1..n_reps); docs drawing 0
    * repeats drop out.
    */
  def materialize(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      alloc: DataFrame
  ): DataFrame = {
    val h = strhash(concat(lit("mix:"), col(idCol).cast("string")))
    val u = (pmod(h * h, lit(1000000007L)) + lit(1L)).cast("double") / lit(1000000008.0)
    // fresh internal names: the caller's group column may itself be
    // called "grp"/"epochs" (the allocators' output names)
    val mg = graft.core.Names.fresh(docs.columns.toSeq, "_mix_grp")
    val me = graft.core.Names.fresh(docs.columns.toSeq :+ mg, "_mix_epochs")
    val frac = col(me) - floor(col(me))
    docs.select(col(idCol), col(groupCol))
      .join(broadcast(alloc.select(col("grp").as(mg), col("epochs").as(me))),
        col(groupCol) === col(mg))
      .withColumn("n_reps",
        floor(col(me)).cast("long") +
          when(u < frac, lit(1L)).otherwise(lit(0L)))
      .filter(col("n_reps") > 0L)
      .select(col(idCol), col(groupCol), col("n_reps"),
        explode(sequence(lit(1L), col("n_reps"))).as("rep"))
  }

  /** Per-slice distribution drift: KL(slice word distribution ‖ corpus
    * word distribution) — the provenance audit a mixture pipeline runs
    * before trusting slice weights (a slice whose vocabulary diverges
    * hard from the pool is a different kind of data, whatever its
    * size). KL over the slice's observed words: Σ p·ln(p/q) with
    * p = within-slice frequency, q = corpus frequency; q > 0 wherever
    * p > 0 by construction (the slice is part of the corpus), so no
    * smoothing is needed.
    *
    * Cross-engine FP discipline (the [[Relevance.bm25]] pattern): each
    * word's p·ln(p/q) is a short chain of identical IEEE ops, quantized
    * to DECIMAL(18,6) per term, and the per-slice total is an EXACT
    * decimal sum — order-independent, so shuffle order can't move a
    * bit. Scale shape: one (slice, word) aggregate and one word
    * aggregate (both map-side combined), the corpus total a collected
    * long re-entered as a literal, then a keyed join — the corpus is
    * touched once.
    */
  def sourceDivergence(
      docs: DataFrame,
      groupCol: String,
      textCol: String
  ): DataFrame = {
    val tok = graft.core.Fan.out(docs).select(col(groupCol).as("grp"),
      explode(TextOps.words(col(textCol))).as("w"))
    val gw = tok.groupBy(col("grp"), col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // feeds the word, slice and corpus rollups
    val wc = gw.groupBy(col("w")).agg(sum(col("c")).as("cw"))
    val gt = gw.groupBy(col("grp")).agg(sum(col("c")).as("tg"))
    // corpus total: ONE long off the checkpointed counts, collected and
    // re-entered as a literal (long→double cast is the identical IEEE
    // value either way) — no 1-row BNLJ
    val tc = gw.agg(coalesce(sum(col("c")), lit(0L))).collect()(0).getLong(0)
    val p = col("c").cast("double") / col("tg").cast("double")
    val q = col("cw").cast("double") / lit(tc).cast("double")
    gw.join(wc, "w").join(gt, "grp")
      .select(col("grp"), col("c"),
        round(p * log(p / q), 6).cast("decimal(18,6)").as("term"))
      .groupBy(col("grp"))
      .agg(
        sum(col("c")).as("tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("term")).cast("double").as("kl_divergence"))
  }

  /** The deterministic TRAINING ORDER — the last mile after mixing and
    * selection: in what sequence do samples reach the trainer. Each
    * slice orders internally by the curriculum (`qualityCol` desc, id
    * asc — easiest/highest-quality first) and takes stratified
    * fractional positions `(j + 0.5) / n_slice` in [0, 1); the global
    * order by position then interleaves every slice proportionally to
    * its size — at any step prefix, each slice has contributed ≈ its
    * mixture share, while the curriculum decays in lockstep across
    * slices. (Repeat-epoch streams: run [[materialize]] first and feed
    * the repeated docs here with the copy index folded into the id.)
    *
    * Position parity is free — one add and one divide on identical
    * operands in both engines; the global step number comes from the
    * two-pass [[graft.core.GlobalOrder]] machinery, NEVER a
    * single-partition window. Per-slice j/n ride an ordinary
    * slice-partitioned window (the slice is the natural partition).
    */
  def trainingOrder(
      docs: DataFrame,
      idCol: String,
      sliceCol: String,
      qualityCol: Column
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sliceCol)).orderBy(col("_q").desc, col(idCol).asc)
    val cnt = Window.partitionBy(col(sliceCol))
    val staged = docs.select(col(idCol), col(sliceCol), qualityCol.as("_q"))
      .withColumn("_j", row_number().over(w).cast("long") - 1L)
      .withColumn("_ns", count(lit(1)).over(cnt))
      .withColumn("pos",
        (col("_j").cast("double") + lit(0.5)) / col("_ns").cast("double"))
    graft.core.GlobalOrder
      .withPrefix(staged,
        Seq(col("pos").asc, col(sliceCol).asc, col("_j").asc),
        lit(1L), cumName = "_cum", rankName = "step")
      .df
      .select(col("step"), col(sliceCol), col(idCol),
        (col("_j") + 1L).as("slice_rank"), col("pos"))
  }
}
