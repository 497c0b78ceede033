package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    val tot = per.agg(sum(col("w_d")).as("w_tot"))
    // zero guards (mirrored in the oracle): a slice whose documents all
    // have 0 tokens gets weight 0 (not 0/0 = NaN epochs), and an
    // all-empty corpus (w_tot = 0) gets all-zero weights instead of
    // NaN propagating into downstream budget math
    val weight = when(col("w_tot").cast("double") > 0.0,
      col("w_d").cast("double") / col("w_tot").cast("double")).otherwise(lit(0.0))
    val alloc = floor(lit(budgetTokens).cast("double") * weight)
    per.crossJoin(broadcast(tot))
      .select(
        col("grp"),
        col("n_docs"),
        col("tokens"),
        weight.as("weight"),
        alloc.cast("long").as("alloc_tokens"),
        when(col("tokens") > 0L, alloc / col("tokens").cast("double"))
          .otherwise(lit(0.0)).as("epochs"))
  }
}
