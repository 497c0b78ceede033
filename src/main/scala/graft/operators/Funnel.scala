package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered multi-step event funnel — the conversion query (did this
  * user view, THEN click, THEN purchase?): per key, the earliest
  * ordinal of step i that falls strictly AFTER the key's matched step
  * i-1 ordinal (the greedy earliest-completion matching; a key that
  * never reaches step i has NULL from there on).
  *
  * Scale shape: the event source is scanned ONCE — a (key, ord, type)
  * projection materializes behind a localCheckpoint barrier (the
  * removeDupSpans/dsirWeights one-scan discipline; before round 7 each
  * stage's filter re-planned a fresh scan of `df`, so a 4-step funnel
  * read the events table 5 times) and every step slice filters THAT
  * narrow frame. Each stage equi-joins the previous stage's
  * ONE-ROW-PER-KEY frame — key-partitioned shuffles whose inputs are
  * step-sized and key-count-sized, never events × events; every
  * aggregate partial-combines map-side. No global windows, no
  * per-key event sorting.
  */
object Funnel {

  /** One row per key: `n_events`, and `step<i>_ord` = the greedy
    * earliest completion ordinal of `steps(i)` (NULL once the funnel
    * stalls).
    */
  def ordered(
      df: DataFrame,
      key: String,
      ord: Column,
      typeCol: Column,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // the one scan: everything downstream (n_events + every step
    // slice) derives from this narrow checkpointed projection
    val base = df.select(col(key), ord.as("_o"), typeCol.as("_t"))
      .localCheckpoint(false)
    var acc = base.groupBy(col(key)).agg(count(lit(1)).as("n_events"))
    var prev: Option[String] = None
    steps.zipWithIndex.foreach { case (st, i) =>
      val cn = s"step${i}_ord"
      val slice = base.filter(col("_t") === st).select(col(key), col("_o"))
      val eligible = prev match {
        case None => slice
        case Some(pc) =>
          slice.join(acc.select(col(key), col(pc)), Seq(key))
            .filter(col("_o") > col(pc))
            .select(col(key), col("_o"))
      }
      acc = acc.join(
        eligible.groupBy(col(key)).agg(min(col("_o")).as(cn)), Seq(key), "left")
      prev = Some(cn)
    }
    acc
  }

  /** First-order Markov transition matrix over per-key event
    * sequences — the "what happens after X" audit next to [[ordered]]
    * (and the sanity model behind next-event prediction): for every
    * (from, to) adjacent pair in a key's ord-sorted stream, the count
    * and the row-conditional probability P(to | from).
    *
    * Scale shape: one key-partitioned window pairs each event with its
    * successor (no self-join), one map-side-combined (from, to)
    * aggregate, and the per-from totals ride a window over the counts
    * — safe HERE because the window's input is the (from, to)
    * aggregate (event-type-vocabulary², never rows-scaled; contrast
    * the Profile.entropy fix, whose window ran over per-VALUE counts).
    * The probability is one IEEE division of exact longs.
    *
    * Streaming twin:
    * [[graft.streaming.StreamingFeatures.transitionsStream]] — lead()
    * is not stream-legal, so the twin folds an O(1) last-type state
    * per key and emits adjacencies; aggregating them reproduces these
    * counts exactly.
    */
  def transitions(df: DataFrame, key: String, ord: Column, typeCol: Column): DataFrame = {
    val seq = org.apache.spark.sql.expressions.Window.partitionBy(col(key)).orderBy(ord)
    val byFrom = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
    df.select(col(key), typeCol.as("from_type"), lead(typeCol, 1).over(seq).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("from_total", sum(col("n")).over(byFrom))
      .withColumn("prob", col("n").cast("double") / col("from_total").cast("double"))
  }

  /** Cohort retention matrix — the second classic behavior query next
    * to [[ordered]]: users are cohorted by the period of their FIRST
    * event (`period = ord floor-div periodSize`), and each (cohort,
    * offset) cell counts how many of that cohort were active `offset`
    * periods later, with the rate against the cohort's size.
    *
    * Scale shape: the event stream collapses to the distinct
    * (user, period) activity matrix in one map-side-combined exchange
    * (a checkpoint barrier shares it between the first-period
    * aggregate and the activity join — both stay partitioned on the
    * user key, so the join re-uses the exchange), then one
    * (cohort, offset) aggregate. The per-cohort size table is
    * periods-count rows — a genuine constant, hint-broadcast onto the
    * cells. The rate is ONE IEEE division of exact longs (never
    * rounded — the commonness discipline), so the oracle replays it
    * bit-for-bit.
    */
  def cohortRetention(
      df: DataFrame,
      userCol: String,
      ordCol: Column,
      periodSize: Long
  ): DataFrame = {
    require(periodSize > 0, s"periodSize must be positive, got $periodSize")
    val up = df
      .select(col(userCol).as("u"), Joins.floorDiv(ordCol.cast("long"), periodSize).as("p"))
      .distinct()
      .localCheckpoint(false) // feeds cohort assignment AND the activity join
    val cohorts = up.groupBy(col("u")).agg(min(col("p")).as("cohort"))
      .localCheckpoint(false) // feeds sizes AND the activity join
    val sizes = cohorts.groupBy(col("cohort")).agg(count(lit(1)).as("cohort_users"))
    val cells = up.join(cohorts, "u")
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("active_users"))
    cells.join(broadcast(sizes), "cohort")
      .select(
        col("cohort"), col("offset"), col("cohort_users"), col("active_users"),
        (col("active_users").cast("double") / col("cohort_users").cast("double"))
          .as("retention"))
  }
}
