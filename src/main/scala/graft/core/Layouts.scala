package graft.core

import org.apache.spark.sql.DataFrame

/** Layout-declared checkpoints — the in-memory analogue of bucketed +
  * sorted tables (guide §2.4) for the iterative graph/ML operators.
  *
  * Every round of an iterative operator joins a STATIC table (edge
  * list, feature matrix) against a small evolving state frame on the
  * same key. The static table is localCheckpoint'd once, but the
  * checkpoint's `LogicalRDD` leaf reports `UnknownPartitioning` under
  * AQE, so EnsureRequirements re-inserted a full Exchange + Sort of
  * the static table into EVERY round's sort-merge join — N−1 redundant
  * full-table shuffles for an N-round loop (measured: the pageRank
  * share join re-exchanged the ~1M-row e2 table each of 5–8 rounds).
  *
  * [[ckptByKey]] materializes the frame ALREADY in the layout the
  * rounds need — one REPARTITION_BY_NUM hash exchange (AQE never
  * coalesces or skew-splits a user-pinned partition count) plus a
  * per-partition sort — and re-declares that layout on the leaf via
  * [[org.apache.spark.sql.graft.Bridge.claimHashLayout]]. Downstream
  * joins/aggregations keyed on the same columns then satisfy their
  * distribution+ordering requirements directly: zero exchange, zero
  * sort on the static side, every round.
  *
  * PARTITION-COUNT RULE (measured, r14): the count must be sized like
  * AQE sizes post-shuffle reads, NOT pinned to
  * `spark.sql.shuffle.partitions`. A declared layout is exempt from
  * AQE coalescing by construction, and it also pins every downstream
  * stage of the round (join output, aggregates) to its width — pinning
  * 32 partitions onto megabyte-sized test-scale frames measured a
  * 1.2–2.7× REGRESSION across the whole iterative family (32 task
  * launches per stage per round for microseconds of work each, where
  * AQE had been coalescing those exchanges to one task). So the count
  * comes from the materialized ROW COUNT × the schema's fixed row
  * width against `spark.sql.adaptive.advisoryPartitionSizeInBytes` —
  * the same target AQE uses — clamped to [1, shuffle.partitions]: one
  * partition at test scale (what AQE chose anyway, now without the
  * per-round re-shuffle), the full shuffle width at real scale.
  *
  * Results are unchanged: the claim only removes re-partitioning of
  * rows that are already so partitioned, and every consumer in this
  * repo is order-free exact arithmetic (the oracle-parity discipline).
  */
object Layouts {

  /** Checkpoint `df` hash-partitioned by `keys` (and per-partition
    * sorted by them) with the layout DECLARED on the leaf — see object
    * scaladoc. Materializes eagerly (the row count sizes the layout);
    * iterative callers were about to materialize on their first round
    * anyway.
    */
  def ckptByKey(df: DataFrame, keys: String*): DataFrame = {
    val ck = df.localCheckpoint(false)
    // one full-scan job: materializes the checkpoint AND yields the
    // row count that sizes the layout (the first loop action would
    // have materialized it regardless)
    ckptByKeyCounted(ck, ck.count(), keys: _*)
  }

  /** [[ckptByKey]] with the row count supplied by the caller — for
    * call sites that already hold (or can bound) the checkpoint's row
    * count from an action they must run anyway, so the sizing does not
    * cost an extra job. `ck` must already be a localCheckpoint'd
    * frame; an over-estimated `rows` only errs toward more partitions.
    */
  def ckptByKeyCounted(ck: DataFrame, rows: Long, keys: String*): DataFrame = {
    val spark = ck.sparkSession
    // fixed-width row estimate: UnsafeRow null bitmap + 8B per field
    // floor — the frames this serves are all long/int columns, and the
    // advisory target only needs to be right within a factor of ~2
    val rowBytes = math.max(8L * ck.schema.size + 8L, ck.schema.defaultSize.toLong)
    val advisory = spark.conf
      .get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB") match {
      case s => org.apache.spark.network.util.JavaUtils.byteStringAsBytes(s)
    }
    val maxN = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val n = math.max(1L, math.min(maxN.toLong,
      (rows * rowBytes + advisory - 1) / advisory)).toInt
    // GATE (measured, r14): below 2 advisory-sized partitions the
    // declared layout cannot win — AQE already coalesces the per-round
    // exchanges of such a frame to one task, and BOTH pinned-width and
    // single-partition claims measured 1.2–2.7× regressions across the
    // iterative family at test scale (32-task stage tax / single-task
    // claims constraining every downstream stage). A sub-advisory
    // table keeps the r13 plain checkpoint; the claim activates
    // exactly when the static side is big enough that its per-round
    // re-exchange dominates task overhead (any real-scale layout).
    // Same no-op-at-test-scale / active-at-scale shape as Fan.out.
    if (n < 2) return ck
    val laidOut = ck
      .repartition(n, keys.map(org.apache.spark.sql.functions.col): _*)
      .sortWithinPartitions(keys.map(org.apache.spark.sql.functions.col): _*)
      .localCheckpoint(false)
    org.apache.spark.sql.graft.Bridge.claimHashLayout(laidOut, keys, keys)
  }
}
