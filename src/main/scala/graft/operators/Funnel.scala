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
}
