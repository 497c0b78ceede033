package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{Sketches, TextOps}

/** Streaming corpus-statistics monitor — the mergeable sketch family
  * under Structured Streaming: per-group distinct-shingle cardinality
  * (KMV), doc-length quantile sample (bottom-k pairs) and top term
  * (Misra–Gries) maintained incrementally as documents arrive. The
  * always-on counterpart of the batch corpus-stats queries
  * (q_distinct_kmv / q_quantile_sketch / q_heavy_hitters), in the
  * reference's eager-maintenance shape (ralf keeps feature tables
  * fresh per record, `ralf/operator.py:122-149`).
  *
  * Why sketches are exactly what a streaming monitor needs: the state
  * store persists each group's serialized aggregate buffer, so state
  * is groups × O(k) REGARDLESS of stream length — an exact
  * distinct-count or percentile would grow state with the corpus. And
  * because every sketch's merge is the same capped fold the batch
  * aggregate uses, the emitted rows CONVERGE to the batch sketches
  * over the same corpus (StreamingSpec pins equality in the exact
  * regime; `n_docs` is monotone per group, so the latest emitted row
  * of an Update-mode sink is the max-n_docs row).
  *
  * Works identically on a static frame (the spec's batch reference) —
  * the projection is one streaming-legal groupBy aggregate.
  */
object CorpusMonitor {

  /** Per-group sketch stats over a `(grp, doc_id, text)` frame (static
    * or streaming). Output: n_docs, estimated distinct shingles,
    * sampled median text length, and the top term with its count
    * (null/absent markers for degenerate groups).
    */
  def stats(
      docs: DataFrame,
      kmvK: Int = 256,
      sampleK: Int = 64,
      hhK: Int = 64
  ): DataFrame = {
    val p = graft.functions.StrHash.P
    val agg = docs
      .groupBy(col("grp"))
      .agg(
        count(lit(1)).as("n_docs"),
        Sketches.kmvAgg(TextOps.shingleHashes(col("text")), kmvK).as("mins"),
        Sketches.bottomKPairsAgg(
          Sketches.sampleKey(col("doc_id")),
          length(col("text")).cast("double"), sampleK).as("lens"),
        Sketches.heavyHittersAgg(TextOps.words(col("text")), hhK).as("hh"))
    val m = size(col("lens"))
    val smp = array_sort(transform(col("lens"), e => e.getField("value")))
    agg.select(
      col("grp"),
      col("n_docs"),
      when(size(col("mins")) < kmvK, size(col("mins")).cast("double"))
        .otherwise(lit((kmvK - 1).toLong * p).cast("double") /
          element_at(col("mins"), kmvK).cast("double"))
        .as("est_distinct_shingles"),
      when(m > 0,
        element_at(smp, (floor(lit(0.5) * (m - 1).cast("double")) + 1).cast("int")))
        .as("p50_len"),
      when(size(col("hh")) > 0, element_at(col("hh"), 1).getField("term")).as("top_term"),
      when(size(col("hh")) > 0, element_at(col("hh"), 1).getField("cnt")).as("top_term_cnt"))
  }
}
