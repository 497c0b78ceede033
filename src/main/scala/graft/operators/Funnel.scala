package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

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

  /** Kaplan–Meier survival estimator (Kaplan & Meier 1958,
    * "Nonparametric estimation from incomplete observations") — the
    * censoring-aware churn curve next to [[cohortRetention]]: each
    * key's lifetime is `max(period) − min(period)`; a key whose last
    * activity falls within `gracePeriods` of the corpus-wide
    * observation end is CENSORED (still alive), everything else is a
    * churn event at its lifetime. Returns one row per period
    * `t = 0..max lifetime`: `(t, n_risk, churned, survival)` with
    * S(t) = Π_{t'≤t} (n_{t'} − d_{t'})/n_{t'} — censored keys leave
    * the risk set without counting as deaths, which plain retention
    * curves get wrong near the observation end.
    *
    * Cross-engine FP discipline — the pageRank fixed-point recipe on
    * a cumulative PRODUCT: survival lives as BIGINT nano-units,
    * each period applying `floor(s · (n−d) / n + 0.5)` — multiply,
    * divide, floor are single IEEE ops with no rounding-mode freedom,
    * so [[kaplanMeierSql]]'s recursive-CTE fold (one level per
    * period, the shedMeanPolicySql precedent) lands bit-identically.
    * (An output-side round() of the true product would not: iterated
    * HALF_UP vs DuckDB's scaled multiply-round drifts — the PageRank
    * lesson.)
    *
    * Scale shape: the corpus-scale work is ONE per-key min/max
    * aggregate followed by ONE lifetime-level aggregate (rows =
    * distinct lifetimes, bounded by the period span). The fold itself
    * runs on the driver over that control-plane-sized table (loud
    * require ≤ 4096 rows — the probeAll contract) with the
    * observation end collected as one long, and the curve re-enters
    * as an explicit-schema local relation (the Bpe.learnMerges
    * convention — no product encoders, sbt console-safe).
    */
  def kaplanMeier(
      df: DataFrame,
      keyCol: String,
      periodCol: Column,
      gracePeriods: Long
  ): DataFrame = {
    require(gracePeriods >= 0, s"gracePeriods must be non-negative, got $gracePeriods")
    val spark = df.sparkSession
    val scale = 1000000000L
    val (byT, total) = lifetimeTable(df, keyCol, periodCol, gracePeriods, "kaplanMeier")
    val maxT = byT.keys.max
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var n = total
    var s = scale
    var t = 0L
    while (t <= maxT) {
      val (a, d) = byT.getOrElse(t, (0L, 0L))
      s = math.floor(s.toDouble * (n - d).toDouble / n.toDouble + 0.5).toLong
      out += Row(t, n, d, s.toDouble / 1.0e9)
      n -= a
      t += 1
    }
    val schema = StructType(Seq(
      StructField("t", LongType, nullable = false),
      StructField("n_risk", LongType, nullable = false),
      StructField("churned", LongType, nullable = false),
      StructField("survival", DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(out.toSeq: _*), schema)
  }

  /** The shared censoring-aware lifetime table of the survival
    * family: one per-key min/max aggregate, one lifetime-level
    * aggregate (`t → (arrivals, churn events)`), bounded by the loud
    * 4096 contract. Returns the map plus the key total.
    */
  private def lifetimeTable(
      df: DataFrame,
      keyCol: String,
      periodCol: Column,
      gracePeriods: Long,
      opName: String
  ): (Map[Long, (Long, Long)], Long) = {
    val k = df.groupBy(col(keyCol).as("k"))
      .agg(min(periodCol.cast("long")).as("fm"), max(periodCol.cast("long")).as("lm"))
      .localCheckpoint(false) // feeds the observation-end aggregate AND the lifetime aggregate
    val head = k.agg(coalesce(max(col("lm")), lit(0L)), count(lit(1))).collect()(0)
    val obsEnd = head.getLong(0)
    val total = head.getLong(1)
    require(total > 0, s"$opName requires at least one key")
    val dur = k.groupBy((col("lm") - col("fm")).as("t"))
      .agg(count(lit(1)).as("a"),
        sum(when(col("lm") < lit(obsEnd - gracePeriods), 1L).otherwise(0L)).as("ev"))
      .limit(4097)
      .collect()
    require(dur.length <= 4096,
      s"$opName lifetime table exceeds 4096 distinct lifetimes — periods too fine-grained")
    (dur.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap, total)
  }

  /** Nelson–Aalen cumulative hazard (Nelson 1972; Aalen 1978) — the
    * [[kaplanMeier]] sibling every survival toolkit ships in pairs:
    * `H(t) = Σ_{t'≤t} d_{t'}/n_{t'}`, the cumulative churn FORCE.
    * Where KM answers "what fraction survives to t", NA answers "how
    * much hazard has accumulated by t" — additive, so hazard curves
    * difference cleanly between cohorts, and near-singular risk sets
    * degrade more gracefully than KM's product. Same censoring rule
    * and lifetime table as [[kaplanMeier]]; returns one row per
    * period `(t, n_risk, churned, cum_hazard)`.
    *
    * Cross-engine FP discipline — STRONGER than KM's: each increment
    * `floor(1e9·d/n + 0.5)` is one division of exact longs and the
    * cumulative is an EXACT long sum (no feedback through the
    * quantizer at all — a sum of independently quantized terms,
    * unlike KM's product fold), so [[nelsonAalenSql]] needs no
    * recursion: a dense period spine + window cumsum replays it.
    *
    * Scale shape: identical to [[kaplanMeier]] — the corpus-scale
    * work is the two aggregates behind the shared lifetime table; the
    * curve itself is control-plane-sized (loud 4096 require).
    */
  def nelsonAalen(
      df: DataFrame,
      keyCol: String,
      periodCol: Column,
      gracePeriods: Long
  ): DataFrame = {
    require(gracePeriods >= 0, s"gracePeriods must be non-negative, got $gracePeriods")
    val spark = df.sparkSession
    val (byT, total) = lifetimeTable(df, keyCol, periodCol, gracePeriods, "nelsonAalen")
    val maxT = byT.keys.max
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var n = total
    var h = 0L
    var t = 0L
    while (t <= maxT) {
      val (a, d) = byT.getOrElse(t, (0L, 0L))
      h += math.floor(1.0e9 * d.toDouble / n.toDouble + 0.5).toLong
      out += Row(t, n, d, h.toDouble / 1.0e9)
      n -= a
      t += 1
    }
    val schema = StructType(Seq(
      StructField("t", LongType, nullable = false),
      StructField("n_risk", LongType, nullable = false),
      StructField("churned", LongType, nullable = false),
      StructField("cum_hazard", DoubleType, nullable = false)))
    spark.createDataFrame(
      java.util.Arrays.asList(out.toSeq: _*), schema)
  }

  /** The [[nelsonAalen]] oracle: `srcSql` yields `(k, m)` rows as
    * [[kaplanMeierSql]] — but NO recursion: n_risk is the key total
    * minus the prior arrivals' window sum over a dense generated
    * period spine, and the hazard is a window cumsum of the
    * independently quantized increments.
    */
  def nelsonAalenSql(srcSql: String, gracePeriods: Long): String =
    s"""WITH na_k AS MATERIALIZED (SELECT k, min(m) AS fm, max(m) AS lm FROM ($srcSql) GROUP BY 1),
       |na_e AS (SELECT MAX(lm) AS e, CAST(count(*) AS BIGINT) AS n FROM na_k),
       |na_d AS MATERIALIZED (SELECT lm - fm AS t, CAST(count(*) AS BIGINT) AS a,
       |    CAST(SUM(CASE WHEN lm < (SELECT e FROM na_e) - $gracePeriods
       |      THEN 1 ELSE 0 END) AS BIGINT) AS ev
       |  FROM na_k GROUP BY 1),
       |na_s AS (SELECT CAST(unnest(range(0,
       |    (SELECT CAST(MAX(t) AS BIGINT) FROM na_d) + 1)) AS BIGINT) AS t),
       |na_j AS (SELECT s.t, COALESCE(d.a, 0) AS a, COALESCE(d.ev, 0) AS ev
       |  FROM na_s s LEFT JOIN na_d d ON d.t = s.t),
       |na_r AS (SELECT t, ev,
       |    (SELECT n FROM na_e) - COALESCE(CAST(SUM(a) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk,
       |    a FROM na_j),
       |na_h AS (SELECT t, n_risk, ev,
       |    CAST(floor(1e9 * CAST(ev AS DOUBLE) / CAST(n_risk AS DOUBLE) + 0.5) AS BIGINT)
       |      AS inc FROM na_r)
       |SELECT t, n_risk, ev AS churned,
       |  CAST(CAST(SUM(inc) OVER (ORDER BY t
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS DOUBLE)
       |    / 1000000000.0 AS cum_hazard
       |FROM na_h ORDER BY t""".stripMargin

  /** The [[kaplanMeier]] oracle: `srcSql` must yield `(k, m)` rows
    * (key, integer period); the recursive CTE advances the fold one
    * period per level — n_risk carried down by subtracting the
    * level's lifetime count, survival by the identical
    * floor(s·(n−d)/n + 0.5) step.
    */
  def kaplanMeierSql(srcSql: String, gracePeriods: Long): String =
    s"""WITH RECURSIVE
       |km_k AS MATERIALIZED (SELECT k, min(m) AS fm, max(m) AS lm FROM ($srcSql) GROUP BY 1),
       |km_e AS (SELECT MAX(lm) AS e, CAST(count(*) AS BIGINT) AS n FROM km_k),
       |km_d AS MATERIALIZED (SELECT lm - fm AS t, CAST(count(*) AS BIGINT) AS a,
       |    CAST(SUM(CASE WHEN lm < (SELECT e FROM km_e) - $gracePeriods
       |      THEN 1 ELSE 0 END) AS BIGINT) AS ev
       |  FROM km_k GROUP BY 1),
       |km_mx AS (SELECT CAST(MAX(t) AS BIGINT) AS mt FROM km_d),
       |km_f (t, n_risk, churned, a, s) AS (
       |  SELECT CAST(-1 AS BIGINT), (SELECT n FROM km_e), CAST(0 AS BIGINT),
       |    CAST(0 AS BIGINT), CAST(1000000000 AS BIGINT)
       |  UNION ALL
       |  SELECT f.t + 1, f.n_risk - f.a, COALESCE(d.ev, 0), COALESCE(d.a, 0),
       |    CAST(floor(CAST(f.s AS DOUBLE)
       |      * CAST(f.n_risk - f.a - COALESCE(d.ev, 0) AS DOUBLE)
       |      / CAST(f.n_risk - f.a AS DOUBLE) + 0.5) AS BIGINT)
       |  FROM km_f f LEFT JOIN km_d d ON d.t = f.t + 1
       |  WHERE f.t + 1 <= (SELECT mt FROM km_mx))
       |SELECT t, n_risk, churned, CAST(s AS DOUBLE) / 1000000000.0 AS survival
       |FROM km_f WHERE t >= 0 ORDER BY t""".stripMargin
}
