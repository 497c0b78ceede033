package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Two-sample distribution tests — the statistical layer over the
  * drift GAUGES ([[Profile.drift]]'s null/distinct deltas,
  * [[graft.llm.Embeddings]]' centroid drift): does the new slice's
  * distribution actually differ, and by how much? The three standard
  * monitors a feature-store/training-data pipeline alarms on:
  *
  *   - [[ksTest]] — Kolmogorov–Smirnov two-sample statistic over a
  *     numeric (integer-quantized) column: the general-purpose
  *     "did this feature's distribution move" test.
  *   - [[chiSquare]] — Pearson chi-square homogeneity over a
  *     categorical column crossed with a slice label: "did the
  *     category MIX shift between cohorts/windows".
  *   - [[psi]] — Population Stability Index over pre-binned values,
  *     Laplace-smoothed: the banded drift score model monitors
  *     threshold at 0.1 / 0.25.
  *
  * The reference's monitoring surface stops at per-feature staleness
  * (ralf/operator.py:236-259 keeps only latest values); these compose
  * its slices into the tests users bolt on downstream.
  *
  * Cross-engine exactness: KS is integer arithmetic down to one
  * closing division (the [[graft.llm.Classify.auc]] discipline);
  * chi-square quantizes each cell's double term with
  * `floor(x·1e6 + 0.5)` over BIGINT units (identical IEEE op
  * sequences in Spark and DuckDB — the PageRank fixed-point recipe;
  * never `round`, whose last ulp differs between the engines);
  * PSI's transcendental terms ride the per-term
  * round(,6)→DECIMAL→exact-sum pattern ([[Windows]].decayedSum
  * precedent).
  *
  * NULL policy: every test runs over OBSERVED values — rows with a
  * NULL value, bin, side, or rank column are excluded up front (and
  * the oracle generators repeat the same WHERE), except [[chiSquare]],
  * which rejects NULL slice/category loudly: silently dropping rows
  * there would change the very mix being tested.
  */
object StatTests {

  private val dec = "decimal(38,0)"

  /** Two-sample Kolmogorov–Smirnov test: `sideA` splits `df` into
    * samples A and B over long-typed `valueCol` (callers pre-quantize
    * doubles to cents/micro-units — the [[Windows.rollingZScore]]
    * discipline); D = max over pooled distinct values v of
    * |F_A(v) − F_B(v)|. One row:
    * `(n_a, n_b, d_num, d_at, d, cliffs_delta)` where `d_num` = the
    * exact integer max of |n_b·cumA(v) − n_a·cumB(v)| (DECIMAL(38,0)
    * ≡ HUGEINT — at corpus scale n·cum overflows a long), `d_at` the
    * smallest value attaining it, `d = d_num / (n_a·n_b)` down to ONE
    * closing division, and `cliffs_delta` the robust effect size
    * `(#(a>b) − #(a<b)) / (n_a·n_b)` — exact pair counts folded off
    * the SAME cumulatives (#(A>B) = Σ_v ca(v) · |B strictly below v|),
    * one more closing division. Empty sides yield n=0 and NULL
    * d/delta rather than a 0/0.
    *
    * Scale shape: one (value) aggregate with map-side combine, then
    * BOTH sides' cumulatives ride ONE
    * [[graft.core.GlobalOrder.withPrefixes]] pass (one range shuffle,
    * one WindowExec — never a single-partition window over the
    * distinct values), closed by a one-row struct-max reduce. Side
    * totals re-enter as literals from the pass's free per-partition
    * stats (the collect-as-literal convention).
    */
  def ksTest(df: DataFrame, valueCol: String, sideA: Column): DataFrame =
    ksFromCounts(sideCounts(df, valueCol, sideA))

  /** The shared first stage of [[ksTest]] / [[wasserstein]]: per-value
    * side counts `(v, c_a, c_b)` — also exactly what
    * [[graft.streaming.StreamingFeatures.valueCountsStream]] maintains
    * live, so any Complete-mode snapshot scores with the identical
    * closing math ([[ksFromCounts]] / [[wassersteinFromCounts]]).
    */
  private def sideCounts(df: DataFrame, valueCol: String, sideA: Column): DataFrame =
    df.select(col(valueCol).cast("long").as("v"), sideA.cast("boolean").as("_a"))
      .filter(col("v").isNotNull && col("_a").isNotNull)
      .groupBy(col("v"))
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("c_b"))

  /** [[ksTest]]'s scoring half over an already-aggregated
    * `(v, c_a, c_b)` counts frame — the live-monitor seam (the
    * psiFromCounts pattern): streamed-final ≡ batch, pinned in
    * StreamingSpec.
    */
  def ksFromCounts(counts: DataFrame): DataFrame = {
    val g = counts.select(col("v").cast("long").as("_v"),
      col("c_a").cast("long").as("_ca"), col("c_b").cast("long").as("_cb"))
    val pref = graft.core.GlobalOrder.withPrefixes(
      g, Seq(col("_v")), Seq(col("_ca") -> "_cum_a", col("_cb") -> "_cum_b"), "_rk")
    val nA = pref.totalSums(0)
    val nB = pref.totalSums(1)
    val diff = abs(lit(nB).cast(dec) * col("_cum_a").cast(dec) -
      lit(nA).cast(dec) * col("_cum_b").cast(dec))
    // lexicographic struct max: largest diff, then smallest rank (= the
    // smallest attaining value, ranks ascend with _v); the same pass
    // also closes Cliff's delta — #(A>B) = Σ ca·(B strictly below v),
    // exact pair counts off the inclusive cumulatives
    val nProd = (lit(nA).cast(dec) * lit(nB).cast(dec)).cast("double")
    pref.df
      .agg(
        max(struct(diff.as("d"), (lit(0L) - col("_rk")).as("nr"), col("_v").as("v"))).as("m"),
        sum(col("_ca").cast(dec) * (col("_cum_b") - col("_cb")).cast(dec)).as("_gt"),
        sum(col("_cb").cast(dec) * (col("_cum_a") - col("_ca")).cast(dec)).as("_lt"))
      .select(
        lit(nA).as("n_a"), lit(nB).as("n_b"),
        col("m.d").cast("double").as("d_num"),
        col("m.v").as("d_at"),
        when(lit(nA > 0L && nB > 0L),
          col("m.d").cast("double") / nProd).as("d"),
        when(lit(nA > 0L && nB > 0L),
          (col("_gt") - col("_lt")).cast("double") / nProd).as("cliffs_delta"))
  }

  /** The [[ksTest]] oracle generator: `srcSql` must yield `(v, a)`
    * with `v` already long-quantized and `a` boolean. HUGEINT mirrors
    * the DECIMAL(38,0) diff; the row-valued `max((d, -rk, v))` is the
    * same lexicographic reduce.
    */
  def ksTestSql(srcSql: String): String =
    s"""WITH ks_g AS (SELECT v, CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
       |  FROM ($srcSql) WHERE v IS NOT NULL AND a IS NOT NULL GROUP BY 1),
       |ks_b AS (SELECT v, ca, cb,
       |    CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
       |    CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b,
       |    row_number() OVER (ORDER BY v) AS rk FROM ks_g),
       |ks_t AS (SELECT CAST(COALESCE(SUM(ca), 0) AS BIGINT) AS n_a,
       |    CAST(COALESCE(SUM(cb), 0) AS BIGINT) AS n_b
       |  FROM ks_g),
       |ks_m AS (SELECT max((abs(CAST((SELECT n_b FROM ks_t) AS HUGEINT) * cum_a -
       |      CAST((SELECT n_a FROM ks_t) AS HUGEINT) * cum_b), -rk, v)) AS m,
       |    CAST(SUM(CAST(ca AS HUGEINT) * (cum_b - cb)) AS HUGEINT) AS gt,
       |    CAST(SUM(CAST(cb AS HUGEINT) * (cum_a - ca)) AS HUGEINT) AS lt
       |  FROM ks_b)
       |SELECT n_a, n_b, CAST(m[1] AS DOUBLE) AS d_num, CAST(m[3] AS BIGINT) AS d_at,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    CAST(m[1] AS DOUBLE) / CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) AS DOUBLE)
       |  END AS d,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    CAST(gt - lt AS DOUBLE) / CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) AS DOUBLE)
       |  END AS cliffs_delta
       |FROM ks_m, ks_t""".stripMargin

  /** Per-key two-sample KS — the fan-out form of [[ksTest]]: score
    * EVERY segment/feature key in one pass ("which of my 200 features
    * drifted overnight"). One row per key:
    * `(key, n_a, n_b, d_num, d_at, d, cliffs_delta)` with the same
    * exact arithmetic as the global test, ordered by key; keys with
    * an empty side yield NULL d/delta (nothing to compare).
    *
    * Scale shape: the corpus reduces MAP-SIDE into (key, value) cells
    * — only the cell table rides the exchanges: once to finish the
    * cell aggregate, once to co-locate each key for the window passes
    * (cumulatives + side totals share that partitioning, and the
    * closing per-key reduce reuses it — no third hash exchange;
    * PlanSpec pins exactly two). Each key's distinct values sort
    * within its partition slice (the [[Windows.cusum]] per-key
    * contract: a key's value domain must fit a task's scan, never its
    * memory).
    */
  def ksByKey(df: DataFrame, keyCol: String, valueCol: String, sideA: Column): DataFrame =
    ksByKeyScore(keyedSideCounts(df, keyCol, valueCol, sideA))

  /** [[ksByKey]]'s scoring half over an already-aggregated
    * `(k, v, c_a, c_b)` per-key counts frame — the keyed cell of the
    * live-monitor matrix: stream the counts
    * ([[graft.streaming.StreamingFeatures.keyedValueCountsStream]]),
    * score any Complete-mode snapshot with identical batch math
    * (streamed-final ≡ batch, StreamingSpec).
    */
  def ksByKeyFromCounts(counts: DataFrame): DataFrame =
    ksByKeyScore(normalizedKeyedCounts(counts))

  /** The shared `(k, v) → side counts` cell build of the per-key
    * two-sample family (exact mergeable longs — which is why a
    * streaming Complete snapshot of the same aggregate scores
    * identically).
    */
  private def keyedSideCounts(
      df: DataFrame, keyCol: String, valueCol: String, sideA: Column): DataFrame =
    df.select(col(keyCol).as("_k"), col(valueCol).cast("long").as("_v"),
        sideA.cast("boolean").as("_a"))
      .filter(col("_k").isNotNull && col("_v").isNotNull && col("_a").isNotNull)
      .groupBy(col("_k"), col("_v"))
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("_ca"),
        sum(when(!col("_a"), 1L).otherwise(0L)).as("_cb"))

  /** Re-aggregates split `(k, v)` rows — the [[chiSquareByKeyFromCounts]]
    * contract: duplicate cells sum instead of silently corrupting the
    * per-key cumulative distributions (and the smoothing totals, which
    * count cells via `count(*)` over the key window).
    */
  private def normalizedKeyedCounts(counts: DataFrame): DataFrame =
    counts.select(col("k").as("_k"), col("v").cast("long").as("_v"),
        col("c_a").cast("long").as("_ca"), col("c_b").cast("long").as("_cb"))
      .groupBy(col("_k"), col("_v"))
      .agg(sum(col("_ca")).as("_ca"), sum(col("_cb")).as("_cb"))

  private def ksByKeyScore(g: DataFrame): DataFrame = {
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_k")).orderBy(col("_v"))
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("_k"))
    val b = g
      .withColumn("_cum_a", sum(col("_ca")).over(wCum))
      .withColumn("_cum_b", sum(col("_cb")).over(wCum))
      .withColumn("_rk", row_number().over(wCum).cast("long"))
      .withColumn("_na", sum(col("_ca")).over(wTot))
      .withColumn("_nb", sum(col("_cb")).over(wTot))
    val diff = abs(col("_nb").cast(dec) * col("_cum_a").cast(dec) -
      col("_na").cast(dec) * col("_cum_b").cast(dec))
    val nProd = (col("n_a").cast(dec) * col("n_b").cast(dec)).cast("double")
    b.groupBy(col("_k").as("key"))
      .agg(max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
        max(struct(diff.as("d"), (lit(0L) - col("_rk")).as("nr"), col("_v").as("v"))).as("m"),
        sum(col("_ca").cast(dec) * (col("_cum_b") - col("_cb")).cast(dec)).as("_gt"),
        sum(col("_cb").cast(dec) * (col("_cum_a") - col("_ca")).cast(dec)).as("_lt"))
      .select(col("key"), col("n_a"), col("n_b"),
        col("m.d").cast("double").as("d_num"),
        col("m.v").as("d_at"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("m.d").cast("double") / nProd).as("d"),
        when(col("n_a") > 0 && col("n_b") > 0,
          (col("_gt") - col("_lt")).cast("double") / nProd).as("cliffs_delta"))
      .orderBy(col("key"))
  }

  /** The [[ksByKey]] oracle generator: `srcSql` yields `(k, v, a)`;
    * per-key windows replay the cumulatives and totals.
    */
  def ksByKeySql(srcSql: String): String =
    s"""WITH kk_g AS (SELECT k, v,
       |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
       |  FROM ($srcSql)
       |  WHERE k IS NOT NULL AND v IS NOT NULL AND a IS NOT NULL GROUP BY 1, 2),
       |kk_b AS (SELECT k, v, ca, cb,
       |    CAST(SUM(ca) OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS cum_a,
       |    CAST(SUM(cb) OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS cum_b,
       |    row_number() OVER (PARTITION BY k ORDER BY v) AS rk,
       |    CAST(SUM(ca) OVER (PARTITION BY k) AS BIGINT) AS na,
       |    CAST(SUM(cb) OVER (PARTITION BY k) AS BIGINT) AS nb FROM kk_g),
       |kk_m AS (SELECT k AS key, MAX(na) AS n_a, MAX(nb) AS n_b,
       |    max((abs(CAST(nb AS HUGEINT) * cum_a - CAST(na AS HUGEINT) * cum_b), -rk, v)) AS m,
       |    CAST(SUM(CAST(ca AS HUGEINT) * (cum_b - cb)) AS HUGEINT) AS gt,
       |    CAST(SUM(CAST(cb AS HUGEINT) * (cum_a - ca)) AS HUGEINT) AS lt
       |  FROM kk_b GROUP BY 1)
       |SELECT key, n_a, n_b, CAST(m[1] AS DOUBLE) AS d_num, CAST(m[3] AS BIGINT) AS d_at,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    CAST(m[1] AS DOUBLE) / CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) AS DOUBLE)
       |  END AS d,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    CAST(gt - lt AS DOUBLE) / CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) AS DOUBLE)
       |  END AS cliffs_delta
       |FROM kk_m ORDER BY key""".stripMargin

  /** Per-key Wasserstein-1 — [[ksByKey]]'s magnitude-aware companion:
    * every segment's drift DISTANCE in one pass (in the value
    * column's own units). One row per key:
    * `(key, n_a, n_b, w1_num, w1)`; keys with an empty side yield
    * NULL w1. Same cell-table shape as [[ksByKey]] (two exchanges,
    * map-side combine, per-key windows); the neighbor gap is a
    * `lead(v)` INSIDE the key window — unlike the global test, no
    * rank self-join is needed, because the window never crosses a key
    * boundary.
    */
  def wassersteinByKey(
      df: DataFrame, keyCol: String, valueCol: String, sideA: Column): DataFrame =
    wassersteinByKeyScore(keyedSideCounts(df, keyCol, valueCol, sideA))

  /** [[wassersteinByKey]]'s scoring half over `(k, v, c_a, c_b)`
    * counts — the [[ksByKeyFromCounts]] twin.
    */
  def wassersteinByKeyFromCounts(counts: DataFrame): DataFrame =
    wassersteinByKeyScore(normalizedKeyedCounts(counts))

  private def wassersteinByKeyScore(g: DataFrame): DataFrame = {
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_k")).orderBy(col("_v"))
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("_k"))
    val b = g
      .withColumn("_cum_a", sum(col("_ca")).over(wCum))
      .withColumn("_cum_b", sum(col("_cb")).over(wCum))
      .withColumn("_nv", lead(col("_v"), 1).over(wCum))
      .withColumn("_na", sum(col("_ca")).over(wTot))
      .withColumn("_nb", sum(col("_cb")).over(wTot))
    val diff = abs(col("_nb").cast(dec) * col("_cum_a").cast(dec) -
      col("_na").cast(dec) * col("_cum_b").cast(dec))
    val term = when(col("_nv").isNotNull,
      diff * (col("_nv") - col("_v")).cast(dec)).otherwise(lit(0L).cast(dec))
    b.groupBy(col("_k").as("key"))
      .agg(max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
        sum(term).as("_w"))
      .select(col("key"), col("n_a"), col("n_b"),
        col("_w").cast("double").as("w1_num"),
        when(col("n_a") > 0 && col("n_b") > 0,
          col("_w").cast("double") /
            (col("n_a").cast(dec) * col("n_b").cast(dec)).cast("double")).as("w1"))
      .orderBy(col("key"))
  }

  /** The [[wassersteinByKey]] oracle generator: `(k, v, a)` contract
    * as [[ksByKeySql]].
    */
  def wassersteinByKeySql(srcSql: String): String =
    s"""WITH wk_g AS (SELECT k, v,
       |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
       |  FROM ($srcSql)
       |  WHERE k IS NOT NULL AND v IS NOT NULL AND a IS NOT NULL GROUP BY 1, 2),
       |wk_b AS (SELECT k, v, ca, cb,
       |    CAST(SUM(ca) OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS cum_a,
       |    CAST(SUM(cb) OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS cum_b,
       |    lead(v) OVER (PARTITION BY k ORDER BY v) AS nv,
       |    CAST(SUM(ca) OVER (PARTITION BY k) AS BIGINT) AS na,
       |    CAST(SUM(cb) OVER (PARTITION BY k) AS BIGINT) AS nb FROM wk_g),
       |wk_m AS (SELECT k AS key, MAX(na) AS n_a, MAX(nb) AS n_b,
       |    CAST(SUM(CASE WHEN nv IS NOT NULL THEN
       |      abs(CAST(nb AS HUGEINT) * cum_a - CAST(na AS HUGEINT) * cum_b)
       |        * CAST(nv - v AS HUGEINT) ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS w
       |  FROM wk_b GROUP BY 1)
       |SELECT key, n_a, n_b, CAST(w AS DOUBLE) AS w1_num,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    CAST(w AS DOUBLE) / CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) AS DOUBLE)
       |  END AS w1
       |FROM wk_m ORDER BY key""".stripMargin

  /** Per-key PSI — the fan-out form of [[psi]]: every segment's
    * stability score in one pass, summarized per key as
    * `(key, bins, n_cur, n_ref, psi)` (the per-bin detail is the
    * global operator's job). Laplace smoothing and the per-term
    * round(6)→DECIMAL discipline are per KEY (B = that key's bin
    * count). Totals ride windows partitioned by the key — bins per
    * key are bounded by the caller's binning, so no key funnels an
    * unbounded stream through one task (the entropy lesson does not
    * bite). No driver collect at all: the per-key totals never leave
    * the executors.
    */
  def psiByKey(df: DataFrame, keyCol: String, binCol: Column, isCur: Column): DataFrame =
    psiByKeyScore(df
      .select(col(keyCol).as("_k"), binCol.cast("long").as("bin"),
        isCur.cast("boolean").as("_c"))
      .filter(col("_k").isNotNull && col("bin").isNotNull && col("_c").isNotNull)
      .groupBy(col("_k"), col("bin"))
      .agg(sum(when(col("_c"), 1L).otherwise(0L)).as("c_cur"),
        sum(when(!col("_c"), 1L).otherwise(0L)).as("c_ref")))

  /** [[psiByKey]]'s scoring half over an already-aggregated
    * `(k, bin, c_cur, c_ref)` per-key counts frame.
    */
  def psiByKeyFromCounts(counts: DataFrame): DataFrame =
    // duplicate (k, bin) rows sum (the chiSquareByKeyFromCounts
    // contract) — split cells must not inflate the Laplace bin count
    psiByKeyScore(counts.select(col("k").as("_k"), col("bin").cast("long").as("bin"),
        col("c_cur").cast("long").as("c_cur"), col("c_ref").cast("long").as("c_ref"))
      .groupBy(col("_k"), col("bin"))
      .agg(sum(col("c_cur")).as("c_cur"), sum(col("c_ref")).as("c_ref")))

  private def psiByKeyScore(g: DataFrame): DataFrame = {
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("_k"))
    val p = (col("c_cur") + lit(1L)).cast("double") /
      (sum(col("c_cur")).over(wTot) + count(lit(1)).over(wTot)).cast("double")
    val q = (col("c_ref") + lit(1L)).cast("double") /
      (sum(col("c_ref")).over(wTot) + count(lit(1)).over(wTot)).cast("double")
    g.withColumn("_p", p)
      .withColumn("_q", q)
      .withColumn("_nc", sum(col("c_cur")).over(wTot))
      .withColumn("_nr", sum(col("c_ref")).over(wTot))
      .withColumn("_t",
        round((col("_p") - col("_q")) * log(col("_p") / col("_q")), 6)
          .cast("decimal(18,6)"))
      .groupBy(col("_k").as("key"))
      .agg(count(lit(1)).as("bins"), max(col("_nc")).as("n_cur"),
        max(col("_nr")).as("n_ref"), sum(col("_t")).cast("double").as("psi"))
      .orderBy(col("key"))
  }

  /** The [[psiByKey]] oracle generator: `srcSql` yields
    * `(k, bin, c)`.
    */
  def psiByKeySql(srcSql: String): String =
    s"""WITH pk_g AS (SELECT k, bin,
       |    CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS c_cur,
       |    CAST(SUM(CASE WHEN c THEN 0 ELSE 1 END) AS BIGINT) AS c_ref
       |  FROM ($srcSql)
       |  WHERE k IS NOT NULL AND bin IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2),
       |pk_b AS (SELECT k, bin, c_cur, c_ref,
       |    CAST(SUM(c_cur) OVER (PARTITION BY k) AS BIGINT) AS nc,
       |    CAST(SUM(c_ref) OVER (PARTITION BY k) AS BIGINT) AS nr,
       |    CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS bb FROM pk_g),
       |pk_x AS (SELECT k, nc, nr,
       |    CAST(round((CAST(c_cur + 1 AS DOUBLE) / CAST(nc + bb AS DOUBLE)
       |        - CAST(c_ref + 1 AS DOUBLE) / CAST(nr + bb AS DOUBLE))
       |      * ln((CAST(c_cur + 1 AS DOUBLE) / CAST(nc + bb AS DOUBLE))
       |        / (CAST(c_ref + 1 AS DOUBLE) / CAST(nr + bb AS DOUBLE))), 6)
       |      AS DECIMAL(18,6)) AS t
       |  FROM pk_b)
       |SELECT k AS key, CAST(count(*) AS BIGINT) AS bins, MAX(nc) AS n_cur,
       |  MAX(nr) AS n_ref, CAST(SUM(t) AS DOUBLE) AS psi
       |FROM pk_x GROUP BY 1 ORDER BY key""".stripMargin

  /** Two-sample Wasserstein-1 (earth-mover's) distance over a
    * long-typed column — the magnitude-aware companion to [[ksTest]]:
    * KS reports the worst single CDF gap, W1 integrates ALL of them,
    * `W1 = Σ_v |F_A(v) − F_B(v)| · gap(v)` over consecutive pooled
    * distinct values — so a small shift of the whole mass scores
    * proportionally to how far it moved (in the value column's own
    * units). One row: `(n_a, n_b, w1_num, w1)` where
    * `w1_num = Σ |n_b·cumA − n_a·cumB| · gap` is an EXACT
    * DECIMAL(38,0) ≡ HUGEINT integer and `w1 = w1_num / (n_a·n_b)`
    * is ONE closing division. Empty sides yield NULL w1.
    *
    * Scale shape: the same one-aggregate + one
    * [[graft.core.GlobalOrder.withPrefixes]] pass as [[ksTest]]; the
    * neighbor gap comes from a rank self-join on the distinct-value
    * frame (rank → rank+1 — one hash shuffle of (rank, v) pairs,
    * never a single-partition window), closed by a one-row reduce.
    */
  def wasserstein(df: DataFrame, valueCol: String, sideA: Column): DataFrame =
    wassersteinFromCounts(sideCounts(df, valueCol, sideA))

  /** [[wasserstein]]'s scoring half over `(v, c_a, c_b)` counts — the
    * other consumer of the shared live seam.
    */
  def wassersteinFromCounts(counts: DataFrame): DataFrame = {
    val g = counts.select(col("v").cast("long").as("_v"),
      col("c_a").cast("long").as("_ca"), col("c_b").cast("long").as("_cb"))
    val pref = graft.core.GlobalOrder.withPrefixes(
      g, Seq(col("_v")), Seq(col("_ca") -> "_cum_a", col("_cb") -> "_cum_b"), "_rk")
    val nA = pref.totalSums(0)
    val nB = pref.totalSums(1)
    val nxt = pref.df.select((col("_rk") - lit(1L)).as("_prk"), col("_v").as("_nv"))
    val diff = abs(lit(nB).cast(dec) * col("_cum_a").cast(dec) -
      lit(nA).cast(dec) * col("_cum_b").cast(dec))
    pref.df
      .join(nxt, col("_rk") === col("_prk"), "inner") // last value has no gap term
      .agg(coalesce(sum(diff * (col("_nv") - col("_v")).cast(dec)), lit(0L).cast(dec))
        .as("_w"))
      .select(
        lit(nA).as("n_a"), lit(nB).as("n_b"),
        col("_w").cast("double").as("w1_num"),
        when(lit(nA > 0L && nB > 0L),
          col("_w").cast("double") /
            (lit(nA).cast(dec) * lit(nB).cast(dec)).cast("double")).as("w1"))
  }

  /** The [[wasserstein]] oracle generator: same `(v, a)` contract as
    * [[ksTestSql]]; `lead(v)` replays the rank self-join's neighbor.
    */
  def wassersteinSql(srcSql: String): String =
    s"""WITH ws_g AS (SELECT v, CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
       |  FROM ($srcSql) WHERE v IS NOT NULL AND a IS NOT NULL GROUP BY 1),
       |ws_b AS (SELECT v,
       |    CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cum_a,
       |    CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cum_b,
       |    lead(v) OVER (ORDER BY v) AS nv FROM ws_g),
       |ws_t AS (SELECT CAST(COALESCE(SUM(ca), 0) AS BIGINT) AS n_a,
       |    CAST(COALESCE(SUM(cb), 0) AS BIGINT) AS n_b
       |  FROM ws_g),
       |ws_m AS (SELECT COALESCE(CAST(SUM(
       |      abs(CAST((SELECT n_b FROM ws_t) AS HUGEINT) * cum_a -
       |          CAST((SELECT n_a FROM ws_t) AS HUGEINT) * cum_b)
       |      * CAST(nv - v AS HUGEINT)) AS HUGEINT), 0) AS w
       |  FROM ws_b WHERE nv IS NOT NULL)
       |SELECT n_a, n_b, CAST(w AS DOUBLE) AS w1_num,
       |  CASE WHEN n_a > 0 AND n_b > 0 THEN
       |    CAST(w AS DOUBLE) / CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) AS DOUBLE)
       |  END AS w1
       |FROM ws_m, ws_t""".stripMargin

  /** Pearson chi-square test of homogeneity: is the distribution of
    * `catCol` the same across the groups of `sliceCol`? One row per
    * DENSIFIED (slice, category) cell — absent combinations count as
    * observed 0, they still carry expectation — with the observed
    * count, row/column totals, the expected count, the cell's
    * contribution, and the total statistic + degrees of freedom +
    * Cramér's V effect size (`√(X²/(N·min(S−1,C−1)))` — one division
    * and one sqrt over the exact micro sum; NULL when dof = 0)
    * replicated on every row. Ordered by (slice, cat).
    *
    * Exactness: every cell term is computed in DOUBLE from exact
    * integer counts — num = o·N − rT·cT, term = num²/(N·rT·cT) — then
    * quantized `floor(term·1e6 + 0.5)` to BIGINT micro-units and
    * exact-summed; one closing /1e6 division per output. Identical
    * IEEE sequences in both engines (the PageRank recipe: floor-based
    * quantization has no rounding-mode freedom).
    *
    * Scale shape: the (slice, cat) crosstab is the distributed
    * reduction of the corpus (one aggregate, map-side combined); its
    * OUTPUT is control-plane-sized by contract — categorical tests
    * with corpus-scale category counts are statistically meaningless —
    * so it collects to the driver (one action; the
    * collect-as-literal convention) where it densifies and re-enters
    * as a LocalRelation: no totals join replanning the scan, no
    * one-row BNLJ.
    */
  def chiSquare(df: DataFrame, sliceCol: String, catCol: String): DataFrame = {
    val spark = df.sparkSession
    val cells = df
      .groupBy(col(sliceCol).cast("string").as("s"), col(catCol).cast("string").as("c"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    require(cells.nonEmpty, "chiSquare: empty input")
    require(!cells.keysIterator.exists(k => k._1 == null || k._2 == null),
      "chiSquare forbids NULL slice/category values — filter or coalesce them first")
    val slices = cells.keysIterator.map(_._1).toSeq.distinct.sorted
    val cats = cells.keysIterator.map(_._2).toSeq.distinct.sorted
    val rowTot = slices.map(s => s -> cats.map(c => cells.getOrElse((s, c), 0L)).sum).toMap
    val colTot = cats.map(c => c -> slices.map(s => cells.getOrElse((s, c), 0L)).sum).toMap
    val n = rowTot.valuesIterator.sum
    val dof = (slices.size - 1).toLong * (cats.size - 1).toLong
    val rows: Seq[Row] = for (s <- slices; c <- cats)
      yield Row(s, c, cells.getOrElse((s, c), 0L), rowTot(s), colTot(c))
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("slice", StringType, nullable = false),
        StructField("cat", StringType, nullable = false),
        StructField("observed", LongType, nullable = false),
        StructField("row_total", LongType, nullable = false),
        StructField("col_total", LongType, nullable = false))))
    val nD = lit(n).cast("double")
    val rT = col("row_total").cast("double")
    val cT = col("col_total").cast("double")
    val num = col("observed").cast("double") * nD - rT * cT
    val termMicro = floor((num * num) / (nD * rT * cT) * lit(1e6) + lit(0.5)).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    local
      .withColumn("expected", rT * cT / nD)
      .withColumn("_tm", termMicro)
      .withColumn("contrib", col("_tm").cast("double") / lit(1e6))
      .withColumn("chi2", (sum(col("_tm")).over(w)).cast("double") / lit(1e6))
      .withColumn("dof", lit(dof))
      .withColumn("cramers_v",
        if (dof == 0L) lit(null).cast(DoubleType)
        else sqrt(col("chi2") /
          lit((n * math.min(slices.size - 1, cats.size - 1)).toDouble)))
      .drop("_tm")
      .orderBy(col("slice"), col("cat"))
  }

  /** The [[chiSquare]] oracle generator: `srcSql` must yield
    * `(s, c)` string pairs; the dense grid is the cross join of the
    * two distinct lists, and every double op replays the operator's
    * sequence exactly.
    */
  def chiSquareSql(srcSql: String): String =
    s"""WITH cs_o AS (SELECT s, c, CAST(count(*) AS BIGINT) AS n FROM ($srcSql) GROUP BY 1, 2),
       |cs_r AS (SELECT s, CAST(SUM(n) AS BIGINT) AS rt FROM cs_o GROUP BY 1),
       |cs_c AS (SELECT c, CAST(SUM(n) AS BIGINT) AS ct FROM cs_o GROUP BY 1),
       |cs_n AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
       |    (SELECT count(*) FROM cs_r) AS ns, (SELECT count(*) FROM cs_c) AS nc FROM cs_o),
       |cs_d AS (SELECT r.s AS slice, c.c AS cat, COALESCE(o.n, 0) AS observed,
       |    r.rt AS row_total, c.ct AS col_total
       |  FROM cs_r r CROSS JOIN cs_c c LEFT JOIN cs_o o ON o.s = r.s AND o.c = c.c),
       |cs_t AS (SELECT slice, cat, observed, row_total, col_total,
       |    CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)
       |      / CAST((SELECT nn FROM cs_n) AS DOUBLE) AS expected,
       |    CAST(floor(
       |      (CAST(observed AS DOUBLE) * CAST((SELECT nn FROM cs_n) AS DOUBLE)
       |         - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE))
       |      * (CAST(observed AS DOUBLE) * CAST((SELECT nn FROM cs_n) AS DOUBLE)
       |         - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE))
       |      / (CAST((SELECT nn FROM cs_n) AS DOUBLE)
       |         * CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE))
       |      * 1e6 + 0.5) AS BIGINT) AS tm
       |  FROM cs_d)
       |SELECT slice, cat, observed, row_total, col_total, expected,
       |  CAST(tm AS DOUBLE) / 1e6 AS contrib,
       |  CAST(SUM(tm) OVER () AS DOUBLE) / 1e6 AS chi2,
       |  CAST((SELECT (ns - 1) * (nc - 1) FROM cs_n) AS BIGINT) AS dof,
       |  CASE WHEN (SELECT (ns - 1) * (nc - 1) FROM cs_n) > 0 THEN
       |    sqrt(CAST(SUM(tm) OVER () AS DOUBLE) / 1e6 /
       |      CAST((SELECT nn * least(ns - 1, nc - 1) FROM cs_n) AS DOUBLE)) END AS cramers_v
       |FROM cs_t ORDER BY slice, cat""".stripMargin

  /** Per-key chi-square — the fan-out form of [[chiSquare]]: every
    * segment's homogeneity test in one pass, one summary row per key
    * `(key, slices, cats, n, chi2, dof, cramers_v)` (per-cell detail
    * is the global operator's job, the [[psiByKey]] convention). Keys
    * with a degenerate table (one slice or one category) report
    * dof = 0 and NULL cramers_v. NULL key/slice/cat rows are dropped
    * (the fan-out convention — the global operator's loud require
    * would abort every other key).
    *
    * Exactness: the same micro-unit term discipline as [[chiSquare]]
    * — exact long observed/row/col/grand totals per key, each cell's
    * term `floor(num²/(n·rt·ct)·1e6 + 0.5)` over identically
    * sequenced doubles, chi2 one closing division of the exact term
    * sum.
    *
    * Scale shape — fully DISTRIBUTED, unlike the control-plane global
    * operator: the dense per-key grid is `rowTot ⋈ colTot` on the key
    * (never a driver collect), cells left-join in, and the one
    * driver-side action is the 4096-cells-per-key loud guard (the
    * kaplanMeier precedent: per-key contingency tables are
    * audit-sized by contract — the guard converts a mis-binned
    * category column into an error instead of a keys×slices×cats
    * row explosion).
    */
  def chiSquareByKey(
      df: DataFrame, keyCol: String, sliceCol: String, catCol: String): DataFrame =
    chiSquareByKeyScore(df
      .select(col(keyCol).as("_k"),
        col(sliceCol).cast("string").as("_s"), col(catCol).cast("string").as("_c"))
      .filter(col("_k").isNotNull && col("_s").isNotNull && col("_c").isNotNull)
      .groupBy(col("_k"), col("_s"), col("_c"))
      .agg(count(lit(1)).as("_n")))

  /** [[chiSquareByKey]]'s scoring half over an already-aggregated
    * `(k, s, c, n)` per-key crosstab — the categorical-association
    * cell of the live-monitor matrix: stream the cells
    * ([[graft.streaming.StreamingFeatures.keyedCrosstabStream]]),
    * score any Complete-mode snapshot with identical batch math
    * (streamed-final ≡ batch, StreamingSpec). Cell counts are summed
    * per (k, s, c) first, so a counts frame with split rows scores
    * identically.
    */
  def chiSquareByKeyFromCounts(counts: DataFrame): DataFrame =
    chiSquareByKeyScore(counts
      .select(col("k").as("_k"), col("s").cast("string").as("_s"),
        col("c").cast("string").as("_c"), col("n").cast("long").as("_n"))
      .groupBy(col("_k"), col("_s"), col("_c"))
      .agg(sum(col("_n")).as("_n")))

  private def chiSquareByKeyScore(cellsIn: DataFrame): DataFrame = {
    val cells = cellsIn
      .localCheckpoint(false) // feeds row totals, col totals, and the dense left-join
    val rowTot = cells.groupBy(col("_k"), col("_s")).agg(sum(col("_n")).as("_rt"))
      .localCheckpoint(false)
    val colTot = cells.groupBy(col("_k"), col("_c")).agg(sum(col("_n")).as("_ct"))
      .localCheckpoint(false)
    val dims = rowTot.groupBy(col("_k"))
      .agg(count(lit(1)).as("_ns"), sum(col("_rt")).as("_nn"))
      .join(colTot.groupBy(col("_k")).agg(count(lit(1)).as("_nc")), Seq("_k"))
      .localCheckpoint(false)
    val worst = dims.agg(coalesce(max(col("_ns") * col("_nc")), lit(0L)))
      .collect()(0).getLong(0)
    require(worst <= 4096,
      s"chiSquareByKey: a key's dense slices×cats grid has $worst cells (> 4096) — " +
        "coarsen the slice/category binning")
    val dense = rowTot.join(colTot, Seq("_k"))
      .join(cells, Seq("_k", "_s", "_c"), "left")
      .select(col("_k"), col("_rt"), col("_ct"), coalesce(col("_n"), lit(0L)).as("_obs"))
      .join(dims, Seq("_k"))
    val nD = col("_nn").cast("double")
    val rT = col("_rt").cast("double")
    val cT = col("_ct").cast("double")
    val num = col("_obs").cast("double") * nD - rT * cT
    dense
      .withColumn("_tm", floor((num * num) / (nD * rT * cT) * lit(1e6) + lit(0.5)).cast("long"))
      .groupBy(col("_k").as("key"))
      .agg(max(col("_ns")).as("slices"), max(col("_nc")).as("cats"),
        max(col("_nn")).as("n"), sum(col("_tm")).as("_tms"),
        max((col("_ns") - 1L) * (col("_nc") - 1L)).as("dof"),
        max(col("_nn") * least(col("_ns") - 1L, col("_nc") - 1L)).as("_cvden"))
      .withColumn("chi2", col("_tms").cast("double") / lit(1e6))
      .withColumn("cramers_v",
        when(col("dof") > 0, sqrt(col("chi2") / col("_cvden").cast("double"))))
      .select(col("key"), col("slices"), col("cats"), col("n"),
        col("chi2"), col("dof"), col("cramers_v"))
      .orderBy(col("key"))
  }

  /** The [[chiSquareByKey]] oracle generator: `srcSql` yields
    * `(k, s, c)`; the per-key dense grid is the k-keyed join of the
    * per-key slice and category total tables.
    */
  def chiSquareByKeySql(srcSql: String): String =
    s"""WITH ck_o AS (SELECT k, s, c, CAST(count(*) AS BIGINT) AS n FROM ($srcSql)
       |  WHERE k IS NOT NULL AND s IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2, 3),
       |ck_r AS (SELECT k, s, CAST(SUM(n) AS BIGINT) AS rt FROM ck_o GROUP BY 1, 2),
       |ck_c AS (SELECT k, c, CAST(SUM(n) AS BIGINT) AS ct FROM ck_o GROUP BY 1, 2),
       |ck_t AS (SELECT r.k, CAST(count(*) AS BIGINT) AS ns, CAST(SUM(rt) AS BIGINT) AS nn
       |  FROM ck_r r GROUP BY 1),
       |ck_cc AS (SELECT k, CAST(count(*) AS BIGINT) AS nc FROM ck_c GROUP BY 1),
       |ck_d AS (SELECT r.k, r.rt, c.ct, COALESCE(o.n, 0) AS obs
       |  FROM ck_r r JOIN ck_c c ON c.k = r.k
       |  LEFT JOIN ck_o o ON o.k = r.k AND o.s = r.s AND o.c = c.c),
       |ck_m AS (SELECT d.k, t.ns, cc.nc, t.nn,
       |    CAST(floor(
       |      (CAST(obs AS DOUBLE) * CAST(t.nn AS DOUBLE)
       |         - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
       |      * (CAST(obs AS DOUBLE) * CAST(t.nn AS DOUBLE)
       |         - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
       |      / (CAST(t.nn AS DOUBLE) * CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE))
       |      * 1e6 + 0.5) AS BIGINT) AS tm
       |  FROM ck_d d JOIN ck_t t ON t.k = d.k JOIN ck_cc cc ON cc.k = d.k),
       |ck_a AS (SELECT k AS key, MAX(ns) AS slices, MAX(nc) AS cats, MAX(nn) AS n,
       |    CAST(SUM(tm) AS BIGINT) AS tms,
       |    CAST(MAX((ns - 1) * (nc - 1)) AS BIGINT) AS dof,
       |    CAST(MAX(nn * least(ns - 1, nc - 1)) AS BIGINT) AS cvden
       |  FROM ck_m GROUP BY 1)
       |SELECT key, slices, cats, n, CAST(tms AS DOUBLE) / 1e6 AS chi2, dof,
       |  CASE WHEN dof > 0 THEN
       |    sqrt(CAST(tms AS DOUBLE) / 1e6 / CAST(cvden AS DOUBLE)) END AS cramers_v
       |FROM ck_a ORDER BY key""".stripMargin

  /** One-way ANOVA F test: does the mean of long-typed `valueCol`
    * (pre-quantized cents/micro-units) differ across the groups of
    * `groupCol`? One row:
    * `(groups, n, ss_between, ss_within, df1, df2, f)`.
    *
    * Exactness: per-group sufficient statistics (n, Σv, Σv²) are
    * exact integers (Σv² in DECIMAL(38,0) — cent squares overflow a
    * long at corpus scale); each group's `Σv_g²/n_g` lands in BIGINT
    * micro-units via `floor(x·1e6 + 0.5)` (identical IEEE sequences,
    * no rounding-mode freedom), so SS_between = Σ_g units − grand
    * units and SS_within = 1e6·Σv² − Σ_g units are EXACT integers and
    * F = (SSB·df2) / (SSW·df1) is integer products — DECIMAL(38,0) ≡
    * HUGEINT — down to ONE closing division. Degenerate inputs (one
    * group, or zero within-variance) yield NULL f, not a 0/0.
    *
    * Scale shape: one (group) aggregate with map-side combine, then a
    * one-row reduce over the control-plane-sized group frame. The
    * corpus is touched once.
    */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val g = df
      .select(col(groupCol).as("_g"), col(valueCol).cast("long").as("_v"))
      .filter(col("_g").isNotNull && col("_v").isNotNull)
      .groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"), sum(col("_v")).as("_s"),
        sum((col("_v") * col("_v")).cast(dec)).as("_ssq"))
    val termMicro = floor(
      (col("_s").cast("double") * col("_s").cast("double")) / col("_n").cast("double") *
        lit(1e6) + lit(0.5)).cast(dec)
    g.agg(count(lit(1)).as("k"), sum(col("_n")).as("n"),
        sum(col("_s")).as("s"), sum(col("_ssq")).as("ssq"),
        sum(termMicro).as("t"))
      .select(
        col("k").as("groups"), col("n"),
        (col("t") - floor((col("s").cast("double") * col("s").cast("double")) /
          col("n").cast("double") * lit(1e6) + lit(0.5)).cast(dec)).as("_ssb"),
        (col("ssq") * lit(1000000L).cast(dec) - col("t")).as("_ssw"),
        (col("k") - lit(1L)).as("df1"), (col("n") - col("k")).as("df2"))
      .select(col("groups"), col("n"),
        (col("_ssb").cast("double") / lit(1e6)).as("ss_between"),
        (col("_ssw").cast("double") / lit(1e6)).as("ss_within"),
        col("df1"), col("df2"),
        when(col("df1") > 0 && col("df2") > 0 && col("_ssw") > 0,
          (col("_ssb") * col("df2").cast(dec)).cast("double") /
            (col("_ssw") * col("df1").cast(dec)).cast("double")).as("f"))
  }

  /** The [[anovaF]] oracle generator: `srcSql` yields `(g, v)` with
    * `v` long-quantized; HUGEINT mirrors DECIMAL(38,0).
    */
  def anovaFSql(srcSql: String): String =
    s"""WITH av_g AS (SELECT g, CAST(count(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s,
       |    CAST(SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS HUGEINT) AS ssq
       |  FROM ($srcSql) WHERE g IS NOT NULL AND v IS NOT NULL GROUP BY 1),
       |av_t AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n,
       |    CAST(SUM(s) AS BIGINT) AS s, CAST(SUM(ssq) AS HUGEINT) AS ssq,
       |    CAST(SUM(CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
       |      * 1e6 + 0.5) AS HUGEINT)) AS HUGEINT) AS t
       |  FROM av_g),
       |av_s AS (SELECT k AS groups, n,
       |    t - CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
       |      * 1e6 + 0.5) AS HUGEINT) AS ssb,
       |    ssq * 1000000 - t AS ssw, k - 1 AS df1, n - k AS df2
       |  FROM av_t)
       |SELECT groups, n, CAST(ssb AS DOUBLE) / 1e6 AS ss_between,
       |  CAST(ssw AS DOUBLE) / 1e6 AS ss_within,
       |  CAST(df1 AS BIGINT) AS df1, CAST(df2 AS BIGINT) AS df2,
       |  CASE WHEN df1 > 0 AND df2 > 0 AND ssw > 0 THEN
       |    CAST(ssb * df2 AS DOUBLE) / CAST(ssw * df1 AS DOUBLE) END AS f
       |FROM av_s""".stripMargin

  /** Mutual information between two categorical columns, in nats:
    * `MI = Σ_cells (o/N) · ln(o·N / (rT·cT))` — the
    * dependence/leakage gauge beside [[chiSquare]] (a feature that
    * carries information about the label split, a slice key that
    * predicts the near-dup component). One row per OBSERVED cell
    * (absent cells contribute exactly 0) with the cell term and the
    * MI total replicated; ordered by (x, y).
    *
    * Exactness: each transcendental term rides
    * round(,6)→DECIMAL(18,6)→exact-sum; independent cells
    * (o·N = rT·cT) hit ln(1) = 0 exactly, so the rounding never sits
    * on a .5 ulp boundary. Marginals are WINDOWS over the
    * localCheckpointed cell aggregate — no totals join replanning the
    * scan (the [[Profile.entropy]] lesson).
    *
    * Scale shape: one (x, y) aggregate with map-side combine; the
    * window passes run over the control-plane-sized cell frame.
    */
  def mutualInfo(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val wx = org.apache.spark.sql.expressions.Window.partitionBy(col("x"))
    val wy = org.apache.spark.sql.expressions.Window.partitionBy(col("y"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val cells = df
      .select(col(xCol).cast("string").as("x"), col(yCol).cast("string").as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("observed"))
      .localCheckpoint(false)
    cells
      .withColumn("row_total", sum(col("observed")).over(wx))
      .withColumn("col_total", sum(col("observed")).over(wy))
      .withColumn("_n", sum(col("observed")).over(wAll))
      .withColumn("_t",
        round((col("observed").cast("double") / col("_n").cast("double")) *
          log((col("observed").cast("double") * col("_n").cast("double")) /
            (col("row_total").cast("double") * col("col_total").cast("double"))), 6)
          .cast("decimal(18,6)"))
      .withColumn("term", col("_t").cast("double"))
      .withColumn("mi", sum(col("_t")).over(wAll).cast("double"))
      .drop("_t", "_n")
      .orderBy(col("x"), col("y"))
  }

  /** The [[mutualInfo]] oracle generator: `srcSql` yields `(x, y)`
    * string pairs; windows replay the marginals.
    */
  def mutualInfoSql(srcSql: String): String =
    s"""WITH mi_o AS (SELECT x, y, CAST(count(*) AS BIGINT) AS observed
       |  FROM ($srcSql) WHERE x IS NOT NULL AND y IS NOT NULL GROUP BY 1, 2),
       |mi_m AS (SELECT x, y, observed,
       |    CAST(SUM(observed) OVER (PARTITION BY x) AS BIGINT) AS row_total,
       |    CAST(SUM(observed) OVER (PARTITION BY y) AS BIGINT) AS col_total,
       |    CAST(SUM(observed) OVER () AS BIGINT) AS nn FROM mi_o),
       |mi_t AS (SELECT x, y, observed, row_total, col_total,
       |    CAST(round((CAST(observed AS DOUBLE) / CAST(nn AS DOUBLE)) *
       |      ln((CAST(observed AS DOUBLE) * CAST(nn AS DOUBLE)) /
       |        (CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE))), 6)
       |      AS DECIMAL(18,6)) AS t
       |  FROM mi_m)
       |SELECT x, y, observed, row_total, col_total, CAST(t AS DOUBLE) AS term,
       |  CAST(SUM(t) OVER () AS DOUBLE) AS mi
       |FROM mi_t ORDER BY x, y""".stripMargin

  /** Spearman rank correlation between two long-typed columns — the
    * monotone-trend / feature-redundancy gauge (Pearson on ranks:
    * robust to any monotone transform of either side). One row:
    * `(n, rho)`; NULL rho when either side is constant.
    *
    * Exactness: tie-averaged ranks kept INTEGER by doubling — a tie
    * group of `c` rows at inclusive cum `cum` shares
    * `2·r̄ = 2·cum − c + 1` (the [[graft.llm.Classify.auc]]
    * identity) — so every rank sum is an exact DECIMAL(38,0) ≡
    * HUGEINT (rank cross-products bound corpus size at ~10^9 rows —
    * same class as the engine's other DECIMAL(38,0) caps; beyond
    * that, pre-aggregate). ρ touches doubles only in the closing
    * (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²) · √(n·Syy − Sy²)) — identical
    * IEEE sequences both engines.
    *
    * Scale shape: the pair table materializes ONCE (localCheckpoint —
    * it feeds both rank tables and the final join); each side's rank
    * table is one (value) aggregate + one
    * [[graft.core.GlobalOrder]] pass over DISTINCT values; ranks come
    * back to the rows via two hash equi-joins keyed on the value
    * (never row-level sorting of the corpus twice), closed by a
    * one-row reduce with map-side combine.
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val rows = df
      .select(col(xCol).cast("long").as("_x"), col(yCol).cast("long").as("_y"))
      .filter(col("_x").isNotNull && col("_y").isNotNull)
      .localCheckpoint(false)
    def rankTable(c: String, rName: String): DataFrame = {
      val g = rows.groupBy(col(c)).agg(count(lit(1)).as("_c"))
      graft.core.GlobalOrder.withPrefix(g, Seq(col(c)), col("_c"), "_cum", "_rk").df
        .select(col(c), (lit(2L) * col("_cum") - col("_c") + lit(1L)).as(rName))
    }
    val joined = rows
      .join(rankTable("_x", "_rx"), Seq("_x"))
      .join(rankTable("_y", "_ry"), Seq("_y"))
    val a = joined.agg(
      count(lit(1)).as("n"),
      sum(col("_rx").cast(dec)).as("sx"), sum(col("_ry").cast(dec)).as("sy"),
      sum(col("_rx").cast(dec) * col("_ry").cast(dec)).as("sxy"),
      sum(col("_rx").cast(dec) * col("_rx").cast(dec)).as("sxx"),
      sum(col("_ry").cast(dec) * col("_ry").cast(dec)).as("syy"))
    val nD = col("n").cast("double")
    val vx = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    a.select(col("n"),
      when(vx > 0 && vy > 0,
        (nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          sqrt(vx * vy)).as("rho"))
  }

  /** Per-key Spearman — the monotone-association member of the per-key
    * drift matrix ([[ksByKey]]'s correlation sibling): every segment's
    * rank correlation between two long columns in one pass, one row
    * per key `(key, n, rho)` ordered by key; a key with a constant
    * side yields NULL rho (undefined, as in [[spearman]]).
    *
    * Exactness: the global operator's doubled tie-averaged integer
    * ranks (2·cum − c + 1 keeps ranks integral under ties), exact
    * DECIMAL(38,0) sums, identical closing double sequence. Scale
    * shape: where the GLOBAL operator needs the two-pass
    * [[graft.core.GlobalOrder]] cumsum (a global rank), the per-key
    * ranks are plain windows PARTITIONED BY the key — no
    * single-partition stage at any corpus size; each key's value
    * domain sorts within its partition slice (the [[ksByKey]]
    * contract).
    */
  def spearmanByKey(
      df: DataFrame, keyCol: String, xCol: String, yCol: String): DataFrame = {
    val rows = df
      .select(col(keyCol).as("_k"),
        col(xCol).cast("long").as("_x"), col(yCol).cast("long").as("_y"))
      .filter(col("_k").isNotNull && col("_x").isNotNull && col("_y").isNotNull)
      .localCheckpoint(false) // feeds both rank tables AND the join
    def rankTable(c: String, rName: String): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_k")).orderBy(col(c))
      rows.groupBy(col("_k"), col(c)).agg(count(lit(1)).as("_c"))
        .withColumn("_cum", sum(col("_c")).over(w))
        .select(col("_k"), col(c), (lit(2L) * col("_cum") - col("_c") + lit(1L)).as(rName))
    }
    val joined = rows
      .join(rankTable("_x", "_rx"), Seq("_k", "_x"))
      .join(rankTable("_y", "_ry"), Seq("_k", "_y"))
    val a = joined.groupBy(col("_k").as("key")).agg(
      count(lit(1)).as("n"),
      sum(col("_rx").cast(dec)).as("sx"), sum(col("_ry").cast(dec)).as("sy"),
      sum(col("_rx").cast(dec) * col("_ry").cast(dec)).as("sxy"),
      sum(col("_rx").cast(dec) * col("_rx").cast(dec)).as("sxx"),
      sum(col("_ry").cast(dec) * col("_ry").cast(dec)).as("syy"))
    val nD = col("n").cast("double")
    val vx = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    a.select(col("key"), col("n"),
      when(vx > 0 && vy > 0,
        (nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          sqrt(vx * vy)).as("rho"))
      .orderBy(col("key"))
  }

  /** The [[spearmanByKey]] oracle generator: `srcSql` yields
    * `(k, x, y)`; the global generator's CTEs with every group,
    * window, and join partitioned by the key.
    */
  def spearmanByKeySql(srcSql: String): String =
    s"""WITH sk_r AS (SELECT k, x, y FROM ($srcSql)
       |  WHERE k IS NOT NULL AND x IS NOT NULL AND y IS NOT NULL),
       |sk_x AS (SELECT k, x,
       |    2 * CAST(SUM(count(*)) OVER (PARTITION BY k ORDER BY x) AS BIGINT)
       |    - CAST(count(*) AS BIGINT) + 1 AS rx FROM sk_r GROUP BY k, x),
       |sk_y AS (SELECT k, y,
       |    2 * CAST(SUM(count(*)) OVER (PARTITION BY k ORDER BY y) AS BIGINT)
       |    - CAST(count(*) AS BIGINT) + 1 AS ry FROM sk_r GROUP BY k, y),
       |sk_j AS (SELECT k, rx, ry FROM sk_r JOIN sk_x USING (k, x) JOIN sk_y USING (k, y)),
       |sk_a AS (SELECT k AS key, CAST(count(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
       |    CAST(SUM(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
       |    CAST(SUM(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS HUGEINT) AS sxy,
       |    CAST(SUM(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS HUGEINT) AS sxx,
       |    CAST(SUM(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS HUGEINT) AS syy
       |  FROM sk_j GROUP BY 1)
       |SELECT key, n,
       |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
       |      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
       |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |  END AS rho
       |FROM sk_a ORDER BY key""".stripMargin

  /** The [[spearman]] oracle generator: `srcSql` yields `(x, y)` long
    * pairs; the doubled tie-average replays via window cumsums.
    */
  def spearmanSql(srcSql: String): String =
    s"""WITH sp_r AS (SELECT x, y FROM ($srcSql)
       |  WHERE x IS NOT NULL AND y IS NOT NULL),
       |sp_x AS (SELECT x, 2 * CAST(SUM(count(*)) OVER (ORDER BY x) AS BIGINT)
       |    - CAST(count(*) AS BIGINT) + 1 AS rx FROM sp_r GROUP BY x),
       |sp_y AS (SELECT y, 2 * CAST(SUM(count(*)) OVER (ORDER BY y) AS BIGINT)
       |    - CAST(count(*) AS BIGINT) + 1 AS ry FROM sp_r GROUP BY y),
       |sp_j AS (SELECT rx, ry FROM sp_r JOIN sp_x USING (x) JOIN sp_y USING (y)),
       |sp_a AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(rx AS HUGEINT)) AS HUGEINT) AS sx,
       |    CAST(SUM(CAST(ry AS HUGEINT)) AS HUGEINT) AS sy,
       |    CAST(SUM(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS HUGEINT) AS sxy,
       |    CAST(SUM(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS HUGEINT) AS sxx,
       |    CAST(SUM(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS HUGEINT) AS syy
       |  FROM sp_j)
       |SELECT n,
       |  CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
       |      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
       |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |      / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |  END AS rho
       |FROM sp_a""".stripMargin

  /** Pairwise Pearson correlation matrix over K pre-quantized long
    * columns in ONE scan — the feature-redundancy profile
    * ([[Profile.profile]]'s numeric companion): one aggregate
    * computes every Σx, Σx², Σx·y exactly (per-row products in
    * DECIMAL(38,0) before multiplying — cent squares overflow a
    * long), one K(K−1)/2-row reshape emits
    * `(col_x, col_y, n, corr)` ordered. K is control-plane-sized by
    * contract; NULL corr for constant columns.
    */
  def correlations(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"correlations needs >= 2 columns, got ${cols.size}")
    require(cols.distinct.size == cols.size, "correlations: duplicate column names")
    val base = df.select(cols.map(c => col(c).cast("long").as(c)): _*)
      .na.drop("any", cols)
    val aggs =
      count(lit(1)).as("n") +:
      (cols.map(c => sum(col(c).cast(dec)).as(s"s_$c")) ++
        cols.map(c => sum(col(c).cast(dec) * col(c).cast(dec)).as(s"ss_$c")) ++
        (for (i <- cols.indices; j <- (i + 1) until cols.size)
          yield sum(col(cols(i)).cast(dec) * col(cols(j)).cast(dec))
            .as(s"sp_${cols(i)}_${cols(j)}")))
    val a = base.agg(aggs.head, aggs.tail: _*)
    val nD = col("n").cast("double")
    def v(c: String): Column =
      nD * col(s"ss_$c").cast("double") -
        col(s"s_$c").cast("double") * col(s"s_$c").cast("double")
    val pairs = for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
      val (cx, cy) = (cols(i), cols(j))
      struct(lit(cx).as("col_x"), lit(cy).as("col_y"), col("n").as("n"),
        when(v(cx) > 0 && v(cy) > 0,
          (nD * col(s"sp_${cx}_${cy}").cast("double") -
            col(s"s_$cx").cast("double") * col(s"s_$cy").cast("double")) /
            sqrt(v(cx) * v(cy))).as("corr"))
    }
    a.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_x").as("col_x"), col("p.col_y").as("col_y"),
        col("p.n").as("n"), col("p.corr").as("corr"))
      .orderBy(col("col_x"), col("col_y"))
  }

  /** The [[correlations]] oracle generator: one aggregate CTE, one
    * UNION ALL row per pair replaying the identical double closes.
    */
  def correlationsSql(srcSql: String, cols: Seq[String]): String = {
    val sums =
      (cols.map(c => s"CAST(SUM(CAST($c AS HUGEINT)) AS HUGEINT) AS s_$c") ++
        cols.map(c => s"CAST(SUM(CAST($c AS HUGEINT) * CAST($c AS HUGEINT)) AS HUGEINT) AS ss_$c") ++
        (for (i <- cols.indices; j <- (i + 1) until cols.size)
          yield s"CAST(SUM(CAST(${cols(i)} AS HUGEINT) * CAST(${cols(j)} AS HUGEINT)) AS HUGEINT)" +
            s" AS sp_${cols(i)}_${cols(j)}")).mkString(",\n    ")
    def v(c: String) =
      s"(CAST(n AS DOUBLE) * CAST(ss_$c AS DOUBLE) - CAST(s_$c AS DOUBLE) * CAST(s_$c AS DOUBLE))"
    val rows = (for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
      val (cx, cy) = (cols(i), cols(j))
      s"""SELECT '$cx' AS col_x, '$cy' AS col_y, n,
         |  CASE WHEN ${v(cx)} > 0 AND ${v(cy)} > 0 THEN
         |    (CAST(n AS DOUBLE) * CAST(sp_${cx}_${cy} AS DOUBLE)
         |      - CAST(s_$cx AS DOUBLE) * CAST(s_$cy AS DOUBLE))
         |    / sqrt(${v(cx)} * ${v(cy)}) END AS corr
         |FROM co_a""".stripMargin
    }).mkString("\nUNION ALL\n")
    s"""WITH co_a AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    $sums
       |  FROM ($srcSql)
       |  WHERE ${cols.map(c => s"$c IS NOT NULL").mkString(" AND ")})
       |$rows
       |ORDER BY col_x, col_y""".stripMargin
  }

  /** Jensen–Shannon + KL divergences between a current and a
    * reference slice's CATEGORICAL distribution — the bounded,
    * symmetric corpus-mixture comparison (data-mixture papers' "how
    * far is my new blend from the old one"; JSD ≤ ln 2 in nats), next
    * to [[psi]]'s banded score and [[chiSquare]]'s significance. One
    * row per category present in the union:
    * `(cat, c_cur, c_ref, p_cur, p_ref, jsd_term, kl_cur_ref,
    * kl_ref_cur, jsd)` with the three totals replicated; ordered.
    * Laplace smoothing `(c+1)/(n+K)` keeps one-sided categories
    * finite (the [[psi]] guard).
    *
    * Exactness: p/q single IEEE divisions of exact longs; every
    * transcendental term rides round(,6)→DECIMAL(18,6)→exact-sum
    * (p=q terms hit ln(1) = 0 exactly — never a .5 boundary); the
    * midpoint m = (p+q)/2 is two more identical IEEE ops.
    *
    * Scale shape: one (cat) aggregate with map-side combine; totals
    * collected as literals off the localCheckpointed aggregate (the
    * [[psi]] shape — categories need not be control-plane-sized).
    */
  def jsDivergence(df: DataFrame, catCol: String, isCur: Column): DataFrame =
    jsDivergenceFromCounts(df
      .select(col(catCol).cast("string").as("cat"), isCur.cast("boolean").as("_c"))
      .filter(col("cat").isNotNull && col("_c").isNotNull)
      .groupBy(col("cat"))
      .agg(sum(when(col("_c"), 1L).otherwise(0L)).as("c_cur"),
        sum(when(!col("_c"), 1L).otherwise(0L)).as("c_ref"))
      .localCheckpoint(false))

  /** [[jsDivergence]]'s scoring half over an already-aggregated
    * `(cat, c_cur, c_ref)` counts frame — the last cell of the
    * live-monitor matrix: stream the per-category counts (the
    * [[graft.streaming.StreamingFeatures.psiCountsStream]] shape with
    * `cat` for `bin`), score any Complete-mode snapshot with the
    * identical batch math; streamed-final ≡ batch (StreamingSpec).
    * Caller materializes `counts` — it is read twice (totals + terms).
    */
  def jsDivergenceFromCounts(counts: DataFrame): DataFrame = {
    val g = counts.select(col("cat").cast("string").as("cat"),
      col("c_cur").cast("long").as("c_cur"), col("c_ref").cast("long").as("c_ref"))
    val t = g.agg(count(lit(1)), coalesce(sum(col("c_cur")), lit(0L)),
      coalesce(sum(col("c_ref")), lit(0L))).collect()(0)
    val (kCnt, nCur, nRef) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val p = (col("c_cur") + lit(1L)).cast("double") / lit(nCur + kCnt).cast("double")
    val q = (col("c_ref") + lit(1L)).cast("double") / lit(nRef + kCnt).cast("double")
    val m = (col("p_cur") + col("p_ref")) / lit(2.0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    g.withColumn("p_cur", p)
      .withColumn("p_ref", q)
      .withColumn("_tpq", round(col("p_cur") * log(col("p_cur") / col("p_ref")), 6)
        .cast("decimal(18,6)"))
      .withColumn("_tqp", round(col("p_ref") * log(col("p_ref") / col("p_cur")), 6)
        .cast("decimal(18,6)"))
      .withColumn("_tj", round(lit(0.5) * col("p_cur") * log(col("p_cur") / m) +
          lit(0.5) * col("p_ref") * log(col("p_ref") / m), 6)
        .cast("decimal(18,6)"))
      .withColumn("jsd_term", col("_tj").cast("double"))
      .withColumn("kl_cur_ref", sum(col("_tpq")).over(w).cast("double"))
      .withColumn("kl_ref_cur", sum(col("_tqp")).over(w).cast("double"))
      .withColumn("jsd", sum(col("_tj")).over(w).cast("double"))
      .drop("_tpq", "_tqp", "_tj")
      .orderBy(col("cat"))
  }

  /** The [[jsDivergence]] oracle generator: `srcSql` yields
    * `(cat, c)` with `c` boolean; totals are scalar subqueries.
    */
  def jsDivergenceSql(srcSql: String): String =
    s"""WITH jd_g AS (SELECT cat, CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS c_cur,
       |    CAST(SUM(CASE WHEN c THEN 0 ELSE 1 END) AS BIGINT) AS c_ref
       |  FROM ($srcSql) WHERE cat IS NOT NULL AND c IS NOT NULL GROUP BY 1),
       |jd_t AS (SELECT count(*) AS k, CAST(SUM(c_cur) AS BIGINT) AS ncur,
       |    CAST(SUM(c_ref) AS BIGINT) AS nref FROM jd_g),
       |jd_p AS (SELECT cat, c_cur, c_ref,
       |    CAST(c_cur + 1 AS DOUBLE) / CAST((SELECT ncur + k FROM jd_t) AS DOUBLE) AS p_cur,
       |    CAST(c_ref + 1 AS DOUBLE) / CAST((SELECT nref + k FROM jd_t) AS DOUBLE) AS p_ref
       |  FROM jd_g),
       |jd_x AS (SELECT cat, c_cur, c_ref, p_cur, p_ref,
       |    CAST(round(p_cur * ln(p_cur / p_ref), 6) AS DECIMAL(18,6)) AS tpq,
       |    CAST(round(p_ref * ln(p_ref / p_cur), 6) AS DECIMAL(18,6)) AS tqp,
       |    CAST(round(0.5 * p_cur * ln(p_cur / ((p_cur + p_ref) / 2.0)) +
       |      0.5 * p_ref * ln(p_ref / ((p_cur + p_ref) / 2.0)), 6) AS DECIMAL(18,6)) AS tj
       |  FROM jd_p)
       |SELECT cat, c_cur, c_ref, p_cur, p_ref, CAST(tj AS DOUBLE) AS jsd_term,
       |  CAST(SUM(tpq) OVER () AS DOUBLE) AS kl_cur_ref,
       |  CAST(SUM(tqp) OVER () AS DOUBLE) AS kl_ref_cur,
       |  CAST(SUM(tj) OVER () AS DOUBLE) AS jsd
       |FROM jd_x ORDER BY cat""".stripMargin

  /** Per-key Jensen–Shannon divergence — the fan-out form of
    * [[jsDivergence]]: every segment's bounded symmetric divergence
    * (plus both KL directions) in one pass, one summary row per key
    * `(key, cats, n_cur, n_ref, kl_cur_ref, kl_ref_cur, jsd)`. NULL
    * key/cat/side rows are dropped (the fan-out convention); Laplace
    * smoothing is per KEY (k = that key's category count), so a
    * category absent from one side within a segment never divides by
    * zero.
    *
    * Exactness: the [[psiByKey]] window discipline — per-key totals
    * as `sum/count OVER (PARTITION BY key)` (exact long adds, then
    * ONE cast to double), each term round(6)→DECIMAL(18,6), the
    * per-key sums exact decimal closed with one double cast.
    *
    * Scale shape: one (key, cat) aggregate with map-side combine,
    * per-key windows over the counts frame (categories per key are
    * the caller's binning — bounded), one (key) reduce. No driver
    * collect at all.
    */
  def jsdByKey(df: DataFrame, keyCol: String, catCol: String, isCur: Column): DataFrame =
    jsdByKeyScore(df
      .select(col(keyCol).as("_k"), col(catCol).cast("string").as("cat"),
        isCur.cast("boolean").as("_c"))
      .filter(col("_k").isNotNull && col("cat").isNotNull && col("_c").isNotNull)
      .groupBy(col("_k"), col("cat"))
      .agg(sum(when(col("_c"), 1L).otherwise(0L)).as("c_cur"),
        sum(when(!col("_c"), 1L).otherwise(0L)).as("c_ref")))

  /** [[jsdByKey]]'s scoring half over an already-aggregated
    * `(k, cat, c_cur, c_ref)` per-key counts frame.
    */
  def jsdByKeyFromCounts(counts: DataFrame): DataFrame =
    // duplicate (k, cat) rows sum (the chiSquareByKeyFromCounts
    // contract) — split cells must not inflate the smoothing cats count
    jsdByKeyScore(counts.select(col("k").as("_k"), col("cat").cast("string").as("cat"),
        col("c_cur").cast("long").as("c_cur"), col("c_ref").cast("long").as("c_ref"))
      .groupBy(col("_k"), col("cat"))
      .agg(sum(col("c_cur")).as("c_cur"), sum(col("c_ref")).as("c_ref")))

  private def jsdByKeyScore(g: DataFrame): DataFrame = {
    val wTot = org.apache.spark.sql.expressions.Window.partitionBy(col("_k"))
    val p = (col("c_cur") + lit(1L)).cast("double") /
      (sum(col("c_cur")).over(wTot) + count(lit(1)).over(wTot)).cast("double")
    val q = (col("c_ref") + lit(1L)).cast("double") /
      (sum(col("c_ref")).over(wTot) + count(lit(1)).over(wTot)).cast("double")
    val m = (col("_p") + col("_q")) / lit(2.0)
    g.withColumn("_p", p)
      .withColumn("_q", q)
      .withColumn("_nc", sum(col("c_cur")).over(wTot))
      .withColumn("_nr", sum(col("c_ref")).over(wTot))
      .withColumn("_tpq", round(col("_p") * log(col("_p") / col("_q")), 6)
        .cast("decimal(18,6)"))
      .withColumn("_tqp", round(col("_q") * log(col("_q") / col("_p")), 6)
        .cast("decimal(18,6)"))
      .withColumn("_tj", round(lit(0.5) * col("_p") * log(col("_p") / m) +
          lit(0.5) * col("_q") * log(col("_q") / m), 6)
        .cast("decimal(18,6)"))
      .groupBy(col("_k").as("key"))
      .agg(count(lit(1)).as("cats"), max(col("_nc")).as("n_cur"),
        max(col("_nr")).as("n_ref"),
        sum(col("_tpq")).cast("double").as("kl_cur_ref"),
        sum(col("_tqp")).cast("double").as("kl_ref_cur"),
        sum(col("_tj")).cast("double").as("jsd"))
      .orderBy(col("key"))
  }

  /** The [[jsdByKey]] oracle generator: `srcSql` yields
    * `(k, cat, c)` with `c` boolean; per-key windows replay the
    * smoothing totals.
    */
  def jsdByKeySql(srcSql: String): String =
    s"""WITH jk_g AS (SELECT k, cat,
       |    CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS c_cur,
       |    CAST(SUM(CASE WHEN c THEN 0 ELSE 1 END) AS BIGINT) AS c_ref
       |  FROM ($srcSql)
       |  WHERE k IS NOT NULL AND cat IS NOT NULL AND c IS NOT NULL GROUP BY 1, 2),
       |jk_p AS (SELECT k, cat, c_cur, c_ref,
       |    CAST(c_cur + 1 AS DOUBLE) / CAST(SUM(c_cur) OVER (PARTITION BY k)
       |      + COUNT(*) OVER (PARTITION BY k) AS DOUBLE) AS p,
       |    CAST(c_ref + 1 AS DOUBLE) / CAST(SUM(c_ref) OVER (PARTITION BY k)
       |      + COUNT(*) OVER (PARTITION BY k) AS DOUBLE) AS q,
       |    CAST(SUM(c_cur) OVER (PARTITION BY k) AS BIGINT) AS ncur,
       |    CAST(SUM(c_ref) OVER (PARTITION BY k) AS BIGINT) AS nref
       |  FROM jk_g),
       |jk_x AS (SELECT k, ncur, nref,
       |    CAST(round(p * ln(p / q), 6) AS DECIMAL(18,6)) AS tpq,
       |    CAST(round(q * ln(q / p), 6) AS DECIMAL(18,6)) AS tqp,
       |    CAST(round(0.5 * p * ln(p / ((p + q) / 2.0)) +
       |      0.5 * q * ln(q / ((p + q) / 2.0)), 6) AS DECIMAL(18,6)) AS tj
       |  FROM jk_p)
       |SELECT k AS key, CAST(count(*) AS BIGINT) AS cats, MAX(ncur) AS n_cur,
       |  MAX(nref) AS n_ref, CAST(SUM(tpq) AS DOUBLE) AS kl_cur_ref,
       |  CAST(SUM(tqp) AS DOUBLE) AS kl_ref_cur, CAST(SUM(tj) AS DOUBLE) AS jsd
       |FROM jk_x GROUP BY 1 ORDER BY key""".stripMargin

  /** Per-key drift DASHBOARD — the keyed twin of the q_drift_report
    * capstone: every segment's KS distance, Cliff's delta,
    * Wasserstein-1, PSI and JSD in ONE row per key, all derived from
    * ONE `(k, v, c_a, c_b)` per-key value-counts table (PSI/JSD
    * re-bin it to `floor(v / binWidth)` — exact long re-aggregation,
    * so the derived bins equal direct binning of the raw rows). Side
    * A is "current" for the smoothed scores. The counts frame is the
    * [[graft.streaming.StreamingFeatures.keyedValueCountsStream]]
    * shape, so a streaming Complete snapshot scores into the same
    * dashboard as the batch operators (StreamingSpec).
    *
    * Scale shape: the four scorers run over the counts/bins tables
    * (cell-sized, never row-scaled) and join on the key — a
    * keys-sized exchange; the corpus was touched once, upstream, by
    * whoever built the counts.
    */
  def perKeyDriftFromCounts(counts: DataFrame, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val base = counts.select(col("k"), col("v").cast("long").as("v"),
        col("c_a").cast("long").as("c_a"), col("c_b").cast("long").as("c_b"))
      .localCheckpoint(false) // feeds KS, W1, and the re-bin
    val binned = base
      .groupBy(col("k"), floor(col("v") / lit(binWidth)).as("bin"))
      .agg(sum(col("c_a")).as("c_cur"), sum(col("c_b")).as("c_ref"))
      .localCheckpoint(false) // feeds PSI and JSD
    ksByKeyFromCounts(base)
      .select(col("key"), col("n_a"), col("n_b"), col("d"), col("cliffs_delta"))
      .join(wassersteinByKeyFromCounts(base).select(col("key"), col("w1")), Seq("key"))
      .join(psiByKeyFromCounts(binned).select(col("key"), col("psi")), Seq("key"))
      .join(jsdByKeyFromCounts(binned.select(col("k"),
          col("bin").cast("string").as("cat"), col("c_cur"), col("c_ref")))
        .select(col("key"), col("jsd")), Seq("key"))
      .orderBy(col("key"))
  }

  /** [[perKeyDriftFromCounts]] over raw rows: builds the shared
    * per-key value-counts cell table (the [[ksByKey]] NULL policy)
    * and scores the dashboard.
    */
  def perKeyDrift(
      df: DataFrame, keyCol: String, valueCol: String, sideA: Column,
      binWidth: Long): DataFrame =
    perKeyDriftFromCounts(
      keyedSideCounts(df, keyCol, valueCol, sideA)
        .select(col("_k").as("k"), col("_v").as("v"),
          col("_ca").as("c_a"), col("_cb").as("c_b")),
      binWidth)

  /** Benford first-digit probabilities `log10(1 + 1/d)`, d = 1..9 —
    * shared double literals (the transcendental-constant convention).
    */
  private[graft] val benfordP: Array[Double] = Array(
    0.3010299956639812, 0.17609125905568124, 0.12493873660829992,
    0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
    0.05799194697768673, 0.05115252244738129, 0.04575749056067514)

  /** Benford's-law audit over a positive long-typed column — the
    * fabricated-data / unit-mixup screen an ingest monitor runs on
    * money-like features: natural multiplicative data leads with
    * digit d with probability log10(1 + 1/d). Nine rows (digits
    * DENSIFIED — an absent digit is itself a signal) of
    * `(digit, observed, p_observed, p_expected, dev, mad)` with
    * `dev = |p_obs − p_exp|` and the mean absolute deviation
    * replicated (Nigrini's MAD gauge: < 0.006 conforming, > 0.015
    * nonconforming for 9-bin tests). Zero and negative values carry
    * no leading significant digit and are excluded (documented NULL
    * policy); NULL mad on an empty input.
    *
    * Exactness: the first digit is a STRING head of the decimal
    * rendering of an integer — no logarithms near bin edges;
    * p_observed is one division of exact longs; each dev rides
    * round(,6)→DECIMAL (p_exp irrational ⇒ never a .5 boundary) and
    * mad closes with one /9 division off the exact decimal sum.
    *
    * Scale shape: one 9-group aggregate with map-side combine,
    * collected (≤ 9 rows) and densified on the driver — the
    * [[chiSquare]] convention.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val counts = df
      .select(col(valueCol).cast("long").as("_v"))
      .filter(col("_v").isNotNull && col("_v") > 0L)
      .select(substring(col("_v").cast("string"), 1, 1).cast("int").as("_d"))
      .groupBy(col("_d")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val n = counts.valuesIterator.sum
    val rows: Seq[Row] = (1 to 9).map(d => Row(d.toLong, counts.getOrElse(d, 0L)))
    val local = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(
        StructField("digit", LongType, nullable = false),
        StructField("observed", LongType, nullable = false))))
    val pExp = (2 to 9).foldLeft(when(col("digit") === 1L, lit(benfordP(0)))) {
      (acc, d) => acc.when(col("digit") === d.toLong, lit(benfordP(d - 1)))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    local
      .withColumn("p_observed",
        if (n == 0L) lit(null).cast(DoubleType)
        else col("observed").cast("double") / lit(n.toDouble))
      .withColumn("p_expected", pExp)
      .withColumn("_dev", round(abs(col("p_observed") - col("p_expected")), 6)
        .cast("decimal(18,6)"))
      .withColumn("dev", col("_dev").cast("double"))
      .withColumn("mad", (sum(col("_dev")).over(w).cast("double") / lit(9.0)))
      .drop("_dev")
      .orderBy(col("digit"))
  }

  /** The [[benford]] oracle generator: `srcSql` yields a positive
    * long `v`; digits densify against a VALUES list and the CASE
    * ladder shares [[benfordP]] verbatim.
    */
  def benfordSql(srcSql: String): String = {
    val caseP = benfordP.zipWithIndex
      .map { case (p, i) => s"WHEN ${i + 1} THEN ${p}" }.mkString(" ")
    s"""WITH bf_c AS (SELECT CAST(substring(CAST(v AS VARCHAR), 1, 1) AS INT) AS d,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM ($srcSql) WHERE v IS NOT NULL AND v > 0 GROUP BY 1),
       |bf_t AS (SELECT COALESCE(CAST(SUM(n) AS BIGINT), 0) AS nn FROM bf_c),
       |bf_d AS (SELECT CAST(dd AS BIGINT) AS digit, COALESCE(c.n, 0) AS observed
       |  FROM (SELECT unnest(range(1, 10)) AS dd) LEFT JOIN bf_c c ON c.d = dd),
       |bf_p AS (SELECT digit, observed,
       |    CASE WHEN (SELECT nn FROM bf_t) > 0 THEN
       |      CAST(observed AS DOUBLE) / CAST((SELECT nn FROM bf_t) AS DOUBLE) END AS p_observed,
       |    CASE digit $caseP END AS p_expected
       |  FROM bf_d),
       |bf_x AS (SELECT digit, observed, p_observed, p_expected,
       |    CAST(round(abs(p_observed - p_expected), 6) AS DECIMAL(18,6)) AS dv
       |  FROM bf_p)
       |SELECT digit, observed, p_observed, p_expected, CAST(dv AS DOUBLE) AS dev,
       |  CAST(SUM(dv) OVER () AS DOUBLE) / 9.0 AS mad
       |FROM bf_x ORDER BY digit""".stripMargin
  }

  /** Concentration audit of group sizes — how unevenly is the corpus
    * spread across sources/shards/languages? One row:
    * `(groups, n, hhi, eff_groups, gini)` — the Herfindahl index
    * `Σ(c_i/N)²`, its reciprocal "effective group count", and the
    * Gini coefficient `(2·Σ i·c_(i) − (k+1)·N) / (k·N)` over counts
    * sorted ascending — the mixture-health gauge next to
    * [[graft.llm.Mixture]]'s weighting (a 0.9-Gini corpus is one
    * source wearing twenty names). NULL metrics on an empty input.
    *
    * Exactness: Σc², Σ i·c_(i) are exact DECIMAL(38,0) ≡ HUGEINT;
    * each output metric is ONE division of exact integers (hhi =
    * Σc²/N², eff = N²/Σc², gini's single closing ratio). Ranks come
    * from the small-frame recipe (coalesce(1) + in-partition sort +
    * monotonically_increasing_id — a foldable-key rank window
    * degenerates); the group aggregate itself is the corpus
    * reduction, map-side combined, control-plane-sized by the same
    * contract as [[chiSquare]].
    */
  def concentration(df: DataFrame, groupCol: String): DataFrame = {
    val g = df
      .select(col(groupCol).cast("string").as("_g"))
      .filter(col("_g").isNotNull)
      .groupBy(col("_g")).agg(count(lit(1)).as("_c"))
    g.coalesce(1)
      .sortWithinPartitions(col("_c"), col("_g"))
      .withColumn("_i", monotonically_increasing_id() + lit(1L))
      .agg(count(lit(1)).as("groups"), coalesce(sum(col("_c")), lit(0L)).as("n"),
        sum(col("_c").cast(dec) * col("_c").cast(dec)).as("_ssq"),
        sum(col("_i").cast(dec) * col("_c").cast(dec)).as("_sic"))
      .select(col("groups"), col("n"),
        when(col("n") > 0,
          col("_ssq").cast("double") /
            (col("n").cast(dec) * col("n").cast(dec)).cast("double")).as("hhi"),
        when(col("n") > 0,
          (col("n").cast(dec) * col("n").cast(dec)).cast("double") /
            col("_ssq").cast("double")).as("eff_groups"),
        when(col("n") > 0,
          (lit(2L).cast(dec) * col("_sic") -
            ((col("groups") + lit(1L)).cast(dec) * col("n").cast(dec))).cast("double") /
            (col("groups").cast(dec) * col("n").cast(dec)).cast("double")).as("gini"))
  }

  /** The [[concentration]] oracle generator: `srcSql` yields `g`;
    * the ascending (count, group) rank replays as a row_number.
    */
  def concentrationSql(srcSql: String): String =
    s"""WITH cn_g AS (SELECT g, CAST(count(*) AS BIGINT) AS c
       |  FROM ($srcSql) WHERE g IS NOT NULL GROUP BY 1),
       |cn_r AS (SELECT c, CAST(row_number() OVER (ORDER BY c, g) AS BIGINT) AS i FROM cn_g),
       |cn_a AS (SELECT CAST(count(*) AS BIGINT) AS groups,
       |    COALESCE(CAST(SUM(c) AS BIGINT), 0) AS n,
       |    CAST(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS HUGEINT) AS ssq,
       |    CAST(SUM(CAST(i AS HUGEINT) * CAST(c AS HUGEINT)) AS HUGEINT) AS sic
       |  FROM cn_r)
       |SELECT groups, n,
       |  CASE WHEN n > 0 THEN CAST(ssq AS DOUBLE)
       |    / CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) AS DOUBLE) END AS hhi,
       |  CASE WHEN n > 0 THEN CAST(CAST(n AS HUGEINT) * CAST(n AS HUGEINT) AS DOUBLE)
       |    / CAST(ssq AS DOUBLE) END AS eff_groups,
       |  CASE WHEN n > 0 THEN CAST(2 * sic - CAST(groups + 1 AS HUGEINT)
       |      * CAST(n AS HUGEINT) AS DOUBLE)
       |    / CAST(CAST(groups AS HUGEINT) * CAST(n AS HUGEINT) AS DOUBLE) END AS gini
       |FROM cn_a""".stripMargin

  /** Poisson(1) CDF — the shared double literals BOTH engines compare
    * the uniform draw against ([[bootstrapMean]]; the shared-literal
    * convention that keeps transcendental constants bit-identical).
    */
  private[graft] val poissonCdf: Array[Double] = Array(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402,
    0.9999998885745216, 0.9999999899522336, 0.9999999991683892,
    0.9999999999364022)

  /** Poisson-bootstrap confidence interval for the mean of a
    * long-typed column — the SCALABLE bootstrap (each row enters each
    * replicate Poisson(1) times, independent across rows; no
    * resampling shuffle, no replicated corpus): B deterministic
    * replicates in ONE pass, the nearest-rank percentile band across
    * their means as the CI. One row per replicate:
    * `(replicate, n_drawn, mean, ci_lo, ci_hi)`, ordered.
    *
    * Determinism: row i's multiplicity in replicate b inverts the
    * Poisson CDF (shared literals) at u = twice-squared
    * strhash("bs:" + id + ":" + b) / P — the [[graft.llm.Sketches]]
    * uniformizer (raw polynomial hashes of short keys concentrate
    * near zero). Replicate sums are exact longs; each mean is ONE
    * closing division; ranking runs on the B-row frame via
    * coalesce(1) + sortWithinPartitions + monotonically_increasing_id
    * (the repo's small-frame ranking recipe — a foldable-key window
    * degenerates to the move-everything spec).
    *
    * Scale shape: explode×B feeds a (replicate) aggregate whose
    * map-side combine collapses each task to B partial rows — the
    * exchange carries B·tasks longs, never B×corpus. CI picks the
    * ⌈α·B⌉-th and ⌈(1−α)·B⌉-th smallest means (nearest-rank).
    */
  def bootstrapMean(
      df: DataFrame,
      idCol: Column,
      valueCol: String,
      b: Int = 40,
      alpha: Double = 0.025
  ): DataFrame = {
    require(b >= 2, s"bootstrapMean needs >= 2 replicates, got $b")
    require(alpha > 0 && alpha < 0.5, s"alpha must be in (0, 0.5), got $alpha")
    val p = graft.functions.StrHash.P
    val h = graft.functions.GraftFunctions.strhash(
      concat(lit("bs:"), col("_id").cast("string"), lit(":"), col("_b").cast("string")))
    val q1 = pmod(h * h, lit(p))
    val u = pmod(q1 * q1, lit(p)).cast("double") / lit(p).cast("double")
    val mult = poissonCdf.zipWithIndex.foldRight(lit(poissonCdf.length.toLong)) {
      case ((c, i), elseExpr) => when(u < lit(c), lit(i.toLong)).otherwise(elseExpr)
    }
    val reps = df
      .select(idCol.as("_id"), col(valueCol).cast("long").as("_v"))
      .filter(col("_id").isNotNull && col("_v").isNotNull)
      .withColumn("_b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("_m", mult)
      .groupBy(col("_b").cast("long").as("replicate"))
      .agg(sum(col("_m")).as("n_drawn"), sum(col("_m") * col("_v")).as("_s"))
      .withColumn("mean",
        when(col("n_drawn") > 0, col("_s").cast("double") / col("n_drawn").cast("double")))
      .drop("_s")
    val rankLo = math.ceil(alpha * b).toLong.max(1L)
    val rankHi = math.ceil((1.0 - alpha) * b).toLong.min(b.toLong)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    reps
      .coalesce(1)
      // asc_nulls_last matches DuckDB's ASC default — a 0-draw
      // replicate's NULL mean (probability e^-n, but a contract, not
      // a hope) must rank identically in both engines
      .sortWithinPartitions(col("mean").asc_nulls_last, col("replicate"))
      .withColumn("_rn", monotonically_increasing_id() + lit(1L))
      .withColumn("ci_lo", max(when(col("_rn") === lit(rankLo), col("mean"))).over(wAll))
      .withColumn("ci_hi", max(when(col("_rn") === lit(rankHi), col("mean"))).over(wAll))
      .drop("_rn")
      .orderBy(col("replicate"))
  }

  /** The [[bootstrapMean]] oracle generator: `srcSql` yields
    * `(id, v)` with `v` long-quantized; `strhash` is the engine's SQL
    * replica (caller passes the corpus's `strhashSql` builder), and
    * the CASE ladder shares [[poissonCdf]]'s literals verbatim.
    */
  def bootstrapMeanSql(
      srcSql: String,
      strhashSql: (String, String) => String,
      b: Int = 40,
      alpha: Double = 0.025
  ): String = {
    val p = graft.functions.StrHash.P
    val hashed = strhashSql(s"concat('bs:', CAST(id AS VARCHAR), ':', CAST(bb AS VARCHAR))", "bh")
    val ladder = poissonCdf.zipWithIndex
      .map { case (c, i) => s"WHEN u < $c THEN $i" }
      .mkString(" ")
    val rankLo = math.ceil(alpha * b).toLong.max(1L)
    val rankHi = math.ceil((1.0 - alpha) * b).toLong.min(b.toLong)
    s"""WITH bs_e AS (SELECT id, v, bb FROM ($srcSql)
       |    CROSS JOIN (SELECT unnest(range(0, $b)) AS bb)
       |  WHERE id IS NOT NULL AND v IS NOT NULL),
       |bs_h AS (SELECT bb, v, ($hashed) AS h FROM bs_e),
       |bs_u AS (SELECT bb, v,
       |    CAST(((h * h) % $p) * ((h * h) % $p) % $p AS DOUBLE)
       |      / CAST($p AS DOUBLE) AS u
       |  FROM bs_h),
       |bs_m AS (SELECT bb, v, CAST(CASE $ladder ELSE ${poissonCdf.length} END AS BIGINT) AS m
       |  FROM bs_u),
       |bs_r AS (SELECT CAST(bb AS BIGINT) AS replicate, CAST(SUM(m) AS BIGINT) AS n_drawn,
       |    CASE WHEN SUM(m) > 0 THEN CAST(SUM(m * v) AS DOUBLE) / CAST(SUM(m) AS DOUBLE) END
       |      AS mean
       |  FROM bs_m GROUP BY 1),
       |bs_k AS (SELECT replicate, n_drawn, mean,
       |    row_number() OVER (ORDER BY mean, replicate) AS rn FROM bs_r)
       |SELECT replicate, n_drawn, mean,
       |  MAX(CASE WHEN rn = $rankLo THEN mean END) OVER () AS ci_lo,
       |  MAX(CASE WHEN rn = $rankHi THEN mean END) OVER () AS ci_hi
       |FROM bs_k ORDER BY replicate""".stripMargin
  }

  /** Population Stability Index between a current and a reference
    * slice over pre-binned values: `PSI = Σ (p_b − q_b)·ln(p_b/q_b)`
    * with Laplace smoothing `p_b = (cur_b + 1)/(n_cur + B)` (B = bins
    * present in the union — smoothing keeps one-sided bins finite,
    * the standard production guard). One row per bin:
    * `(bin, c_cur, c_ref, p_cur, p_ref, term, psi)`, psi replicated,
    * ordered by bin. Callers bin upstream (fixed-width
    * `floor(value/width)` or [[Windows.quantileBins]] labels cast to
    * long).
    *
    * Exactness: p/q are single IEEE divisions of exact longs; each
    * transcendental term rides round(,6)→DECIMAL(18,6) and the total
    * is the exact decimal sum (the [[Windows]].decayedSum pattern —
    * terms are irrational except p=q where the term is exactly 0, so
    * the rounding never sits on a .5 ulp boundary).
    *
    * Scale shape: one (bin) aggregate with map-side combine; the bin
    * table is bounded by the caller's binning. Totals are collected
    * as literals off a localCheckpointed aggregate (one extra action,
    * no totals join replanning the scan, no one-row BNLJ).
    */
  def psi(df: DataFrame, binCol: Column, isCur: Column): DataFrame =
    psiFromCounts(df
      .select(binCol.cast("long").as("bin"), isCur.cast("boolean").as("_c"))
      .filter(col("bin").isNotNull && col("_c").isNotNull)
      .groupBy(col("bin"))
      .agg(sum(when(col("_c"), 1L).otherwise(0L)).as("c_cur"),
        sum(when(!col("_c"), 1L).otherwise(0L)).as("c_ref"))
      .localCheckpoint(false))

  /** [[psi]]'s scoring half over an ALREADY-AGGREGATED
    * `(bin, c_cur, c_ref)` counts frame — the seam a live monitor
    * shares: stream the counts (an exact mergeable aggregate through
    * the state store, Complete mode — see
    * [[graft.streaming.StreamingFeatures.psiCountsStream]]), score
    * any snapshot with the IDENTICAL math the batch operator runs, so
    * streamed-final ≡ batch over the same rows (the confusionStream /
    * evalMetricsFromCounts pattern). Caller materializes `counts`
    * (checkpoint or memory-sink table) — it is read twice (totals +
    * terms).
    */
  def psiFromCounts(counts: DataFrame): DataFrame = {
    val g = counts.select(col("bin").cast("long").as("bin"),
      col("c_cur").cast("long").as("c_cur"), col("c_ref").cast("long").as("c_ref"))
    val t = g.agg(count(lit(1)), coalesce(sum(col("c_cur")), lit(0L)),
      coalesce(sum(col("c_ref")), lit(0L))).collect()(0)
    val (bCnt, nCur, nRef) = (t.getLong(0), t.getLong(1), t.getLong(2))
    val p = (col("c_cur") + lit(1L)).cast("double") / lit(nCur + bCnt).cast("double")
    val q = (col("c_ref") + lit(1L)).cast("double") / lit(nRef + bCnt).cast("double")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    g.withColumn("p_cur", p)
      .withColumn("p_ref", q)
      .withColumn("_t",
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6)
          .cast("decimal(18,6)"))
      .withColumn("term", col("_t").cast("double"))
      .withColumn("psi", sum(col("_t")).over(w).cast("double"))
      .drop("_t")
      .orderBy(col("bin"))
  }

  /** The [[psi]] oracle generator: `srcSql` must yield `(bin, c)`
    * with `bin` long and `c` boolean; totals are scalar subqueries
    * (same values the operator re-enters as literals).
    */
  def psiSql(srcSql: String): String =
    s"""WITH psi_g AS (SELECT bin, CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS c_cur,
       |    CAST(SUM(CASE WHEN c THEN 0 ELSE 1 END) AS BIGINT) AS c_ref
       |  FROM ($srcSql) WHERE bin IS NOT NULL AND c IS NOT NULL GROUP BY 1),
       |psi_t AS (SELECT count(*) AS b, CAST(SUM(c_cur) AS BIGINT) AS ncur,
       |    CAST(SUM(c_ref) AS BIGINT) AS nref FROM psi_g),
       |psi_p AS (SELECT bin, c_cur, c_ref,
       |    CAST(c_cur + 1 AS DOUBLE) / CAST((SELECT ncur + b FROM psi_t) AS DOUBLE) AS p_cur,
       |    CAST(c_ref + 1 AS DOUBLE) / CAST((SELECT nref + b FROM psi_t) AS DOUBLE) AS p_ref
       |  FROM psi_g),
       |psi_x AS (SELECT bin, c_cur, c_ref, p_cur, p_ref,
       |    CAST(round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS DECIMAL(18,6)) AS t
       |  FROM psi_p)
       |SELECT bin, c_cur, c_ref, p_cur, p_ref, CAST(t AS DOUBLE) AS term,
       |  CAST(SUM(t) OVER () AS DOUBLE) AS psi
       |FROM psi_x ORDER BY bin""".stripMargin
}
