package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed linear algebra over the embedding column — the
  * dimensionality-analysis stage of an embedding pipeline (OPQ-style
  * rotation prep, drift monitoring, "is this embedding space
  * collapsing onto one axis?"): second-moment (Gram) accumulation in
  * one pass and principal-component projection, exact enough for a
  * DuckDB oracle to replay bit-for-bit.
  *
  * Cross-engine FP discipline — the MMR exact-decimal route: each
  * vector component quantizes ONCE (`round(cast(double), 6)` →
  * DECIMAL(18,6), identical in both engines), and every product/sum
  * after that is EXACT decimal arithmetic — order-free, so Spark's
  * unordered aggregation and DuckDB's ordered fold agree exactly, and
  * no intermediate ever rounds (no .5-ulp freedom anywhere). The
  * operator is therefore defined as exact linear algebra over the
  * 6-dp-quantized vectors.
  *
  * Scale shape: [[gram]] is ONE Catalyst aggregate
  * ([[graft.functions.GramSheet]]) — each task folds raw vectors into
  * a d·(d+3)/2-cell exact fixed-point buffer in place (no explode, no
  * join, no per-element shuffle rows), and the exchange carries one
  * ~2·cells·8-byte buffer per task however large the corpus. The
  * eigen step runs on the DRIVER over the collected d×d matrix (d²
  * decimals — control-plane sized at any corpus scale; the corpus
  * never moves), and the resulting component re-enters both engines
  * as shared DECIMAL literals — the rankingMetrics DCG-weights
  * discipline, so the projection needs no model table at all.
  */
object Embeddings {

  /** Second-moment sheet of the quantized embedding matrix, one pass:
    * for 1 ≤ i ≤ j ≤ d the exact decimal `Σ q_i·q_j` (upper-triangle
    * Gram entries, `cnt` = vector count), plus one `j = -1` row per
    * dimension carrying the first moment `Σ q_i` — everything the
    * covariance needs, in one uniform oracle-friendly shape. Computed
    * by the [[graft.functions.GramSheet]] one-pass aggregate: values
    * are bit-identical to the former explode + vid-self-join plan
    * (same quantize-once decimals, exact sums, one closing double
    * cast) with the shuffle shrunk from rows × d to tasks × d².
    * `idCol` is retained for signature stability; the sheet depends
    * only on the vector multiset.
    */
  def gram(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val sheet = Bridge.column(graft.functions.GramSheet(
      Bridge.expression(col(vecCol))).toAggregateExpression())
    df.select(col(vecCol))
      .agg(sheet.as("sheet"))
      .select(inline(col("sheet")))
  }

  /** Per-cohort second-moment sheets in ONE aggregate — [[gram]]
    * keyed by `groupCol`: each task folds its rows into one
    * [[graft.functions.GramSheet]] buffer PER GROUP (map-side
    * combined), the exchange carries groups × tasks buffers, and the
    * output is (grp, i, j, cnt, g) — the per-label covariance feed
    * for cohort-level PCA/drift (each group's sheet drives
    * [[pcaComponents]] independently). Same exactness contract as
    * [[gram]]; groups may have different vector counts but every
    * vector corpus-wide must share one dimension.
    */
  def gramBy(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val sheet = Bridge.column(graft.functions.GramSheet(
      Bridge.expression(col(vecCol))).toAggregateExpression())
    df.select(col(groupCol).as("grp"), col(vecCol))
      .groupBy(col("grp"))
      .agg(sheet.as("sheet"))
      .select(col("grp"), inline(col("sheet")))
  }

  /** The [[gramBy]] oracle generator over the same table SQL. */
  def gramBySql(tableSql: String, groupCol: String, dim: Int): String =
    s"""WITH qx AS (
       |  SELECT $groupCol AS grp, vec_id, ui AS i,
       |    CAST(round(CAST(embedding[CAST(ui AS INT)] AS DOUBLE), 6) AS DECIMAL(18,6)) AS q
       |  FROM ($tableSql), (SELECT unnest(range(1, ${dim + 1})) AS ui)),
       |pairs AS (
       |  SELECT a.grp, a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(a.q * b.q) AS DOUBLE) AS g
       |  FROM qx a JOIN qx b ON a.vec_id = b.vec_id AND a.i <= b.i
       |  GROUP BY 1, 2, 3),
       |firsts AS (
       |  SELECT grp, i, CAST(-1 AS BIGINT) AS j, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(q) AS DOUBLE) AS g
       |  FROM qx GROUP BY 1, 2)
       |SELECT grp, i, j, cnt, g FROM pairs
       |UNION ALL SELECT grp, i, j, cnt, g FROM firsts
       |ORDER BY grp, i, j""".stripMargin

  /** The dominant principal component of the quantized embeddings,
    * computed from ONE distributed pass: [[gram]] collects to the
    * driver (d² + d decimals), the covariance `C = G/n − m·mᵀ` and a
    * deterministic power iteration (all-ones start, `iters` rounds,
    * sign fixed so the largest-magnitude entry is positive) run in
    * driver doubles, and the unit component quantizes to
    * DECIMAL(18,6) entries. Returns (weights 1..d, projected mean,
    * eigenvalue estimate) — the literals both the Spark projection
    * and the generated oracle share.
    */
  def pcaComponent(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      iters: Int = 100
  ): (Seq[java.math.BigDecimal], java.math.BigDecimal, Double) =
    pcaComponents(spark, df, idCol, vecCol, nComponents = 1, iters).head

  /** The leading `nComponents` principal components by Hotelling
    * deflation over the ONE collected covariance (`C ← C − λ·u·uᵀ`
    * after each extraction — no second distributed pass, ever):
    * one (weights, projected mean, eigenvalue) triple per component,
    * eigenvalues non-increasing, components mutually orthogonal
    * (EmbeddingsSpec pins both). Each component's literals feed
    * [[project]] independently — a k-component embedding map is k
    * projection columns over one scan.
    */
  def pcaComponents(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nComponents: Int,
      iters: Int = 100
  ): Seq[(Seq[java.math.BigDecimal], java.math.BigDecimal, Double)] = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(nComponents >= 1, s"nComponents must be >= 1, got $nComponents")
    eigenOf(
      gram(df, idCol, vecCol).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))),
      nComponents, iters)
  }

  /** Per-cohort principal components off ONE [[gramBy]] pass: the
    * grouped sheets collect (groups × d² decimals — control-plane),
    * and each cohort runs the same driver eigen ([[pcaComponents]]'
    * power iteration + Hotelling deflation) over its own covariance.
    * Returns cohort → components, eigenvalues non-increasing within
    * each cohort. Cohorts with fewer independent directions than
    * `nComponents` fail loudly (the degenerate-covariance require).
    */
  def pcaComponentsBy(
      spark: SparkSession,
      df: DataFrame,
      groupCol: String,
      vecCol: String,
      nComponents: Int,
      iters: Int = 100
  ): Map[String, Seq[(Seq[java.math.BigDecimal], java.math.BigDecimal, Double)]] = {
    require(iters >= 1 && nComponents >= 1,
      s"iters/nComponents must be >= 1, got $iters/$nComponents")
    val rows = gramBy(df, groupCol, vecCol)
      .select(col("grp").cast("string"), col("i"), col("j"), col("cnt"), col("g"))
      .collect()
    rows.groupBy(_.getString(0)).map { case (grp, rs) =>
      grp -> eigenOf(rs.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))),
        nComponents, iters)
    }
  }

  /** Embedding-space drift along the dominant axis, per cohort — the
    * component-level monitor next to [[graft.queries]]' projection-
    * quantile drift: ONE distributed [[gramBy]] pass (plus the global
    * [[gram]] sheet), driver eigen per cohort, and the report gives
    * each cohort's dominant eigenvalue and |cosine| alignment with the
    * corpus-wide dominant axis. A cohort whose axis swings away from
    * the corpus axis (alignment → 0) or whose eigenvalue balloons is
    * drifting structurally, not just in location. Driver artifact
    * (eigenvectors are data-dependent — spec-covered, not oracled).
    */
  def axisDrift(
      spark: SparkSession,
      df: DataFrame,
      groupCol: String,
      vecCol: String,
      iters: Int = 100
  ): Seq[(String, Double, Double)] = {
    val (gw, _, _) = pcaComponent(spark, df, "_unused", vecCol, iters)
    val global = gw.map(_.doubleValue).toArray
    pcaComponentsBy(spark, df, groupCol, vecCol, nComponents = 1, iters)
      .toSeq.sortBy(_._1)
      .map { case (grp, Seq((w, _, lambda))) =>
        val u = w.map(_.doubleValue).toArray
        val cos = math.abs(u.zip(global).map { case (a, b) => a * b }.sum)
        (grp, lambda, cos)
      }
  }

  /** The shared driver eigen core over one collected sheet:
    * (i, j, cnt, g) rows — j = −1 carries the first moments — to the
    * leading components by power iteration + Hotelling deflation.
    */
  private def eigenOf(
      rows: Array[(Long, Long, Long, Double)],
      nComponents: Int,
      iters: Int
  ): Seq[(Seq[java.math.BigDecimal], java.math.BigDecimal, Double)] = {
    val d = rows.count(_._2 == -1L)
    require(d >= 1, "eigen needs at least one dimension")
    require(nComponents <= d, s"nComponents $nComponents exceeds dimension $d")
    val n = rows.find(_._2 == -1L).get._3.toDouble
    val mean = new Array[Double](d)
    val g = Array.ofDim[Double](d, d)
    rows.foreach { case (i0, j0, _, v) =>
      val i = i0.toInt - 1
      val j = j0.toInt
      if (j == -1) mean(i) = v / n
      else { g(i)(j - 1) = v; g(j - 1)(i) = v }
    }
    val c = Array.tabulate(d, d)((i, j) => g(i)(j) / n - mean(i) * mean(j))
    def q6(x: Double): java.math.BigDecimal =
      new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    (1 to nComponents).map { _ =>
      var u = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
      var lambda = 0.0
      for (_ <- 1 to iters) {
        val v = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * u(j)).sum)
        val norm = math.sqrt(v.map(x => x * x).sum)
        require(norm > 0, "power iteration collapsed — degenerate covariance " +
          "(fewer independent directions than nComponents)")
        u = v.map(_ / norm)
        lambda = norm
      }
      val kMax = (0 until d).maxBy(i => (math.abs(u(i)), -i))
      if (u(kMax) < 0) u = u.map(x => -x)
      for (i <- 0 until d; j <- 0 until d) c(i)(j) -= lambda * u(i) * u(j)
      val projMean = q6((0 until d).map(i => mean(i) * u(i)).sum)
      (u.map(q6).toSeq, projMean, lambda)
    }
  }

  /** Project every vector onto shared component literals in EXACT
    * FIXED POINT (the PageRank BIGINT discipline, because a d-term
    * decimal addition chain trips Spark's precision-loss scale
    * reduction around 38 digits): components quantize to micro-units
    * (`round(6)` decimal × 10⁶, exact), weights enter as micro-unit
    * long literals, so `Σ q·w − c` is exact integer arithmetic at
    * scale 10¹², and the single closing division by 1e12 is one IEEE
    * op both engines share. No joins, no model table: the weights are
    * literals in the plan, exactly as in the generated oracle
    * ([[pcaProjectSql]]). Bounds: |component| ≤ 10³ and |weight| ≤ 1
    * keep `d ≤ 64` sums within long range with 10⁴ headroom.
    */
  def project(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      weights: Seq[java.math.BigDecimal],
      center: java.math.BigDecimal,
      keep: Seq[String] = Nil
  ): DataFrame = {
    require(weights.nonEmpty, "project needs at least one weight")
    require(weights.size <= 64,
      s"project supports at most 64 dimensions (long-range headroom), got ${weights.size}")
    weights.foreach { w =>
      require(w.abs.compareTo(java.math.BigDecimal.ONE) <= 0,
        s"project weights must satisfy |w| <= 1 (unit components), got $w")
    }
    val terms = weights.zipWithIndex.map { case (w, i0) =>
      val qDec = round(element_at(col(vecCol), i0 + 1).cast("double"), 6)
        .cast("decimal(18,6)")
      // out-of-contract components (|x| > 1e3) would silently wrap the
      // non-ANSI long sum — fail loudly instead (ADVICE r8)
      val qMicro = when(abs(qDec) <= lit(1000.0),
          (qDec * lit(1000000L)).cast("long"))
        .otherwise(raise_error(concat(
          lit(s"Embeddings.project: |$vecCol| component exceeds the 1e3 fixed-point bound: "),
          qDec.cast("string"))).cast("long"))
      qMicro * lit(w.movePointRight(6).longValueExact)
    }
    val cPico = center.movePointRight(12).longValueExact
    df.select(col(idCol).as("vid") +: keep.map(col) :+
      ((terms.reduce(_ + _) - lit(cPico)).cast("double") / lit(1.0e12)).as("score"): _*)
  }

  /** The projection's SQL expression over an `embedding` column — the
    * same micro-unit literals, for embedding the score inside larger
    * generated oracles.
    */
  def projectExprSql(
      weights: Seq[java.math.BigDecimal],
      center: java.math.BigDecimal
  ): String = {
    val terms = weights.zipWithIndex.map { case (w, i0) =>
      s"CAST(CAST(round(CAST(embedding[${i0 + 1}] AS DOUBLE), 6) AS DECIMAL(18,6))" +
        s" * 1000000 AS BIGINT) * CAST(${w.movePointRight(6).longValueExact} AS BIGINT)"
    }.mkString("\n    + ")
    val cPico = center.movePointRight(12).longValueExact
    s"CAST(($terms)\n    - CAST($cPico AS BIGINT) AS DOUBLE) / 1e12"
  }

  /** The [[project]] oracle generator — the same micro-unit literals
    * over any `(vec_id, embedding)` table SQL.
    */
  def pcaProjectSql(
      tableSql: String,
      weights: Seq[java.math.BigDecimal],
      center: java.math.BigDecimal
  ): String =
    s"""SELECT vec_id AS vid,
       |  ${projectExprSql(weights, center)} AS score
       |FROM ($tableSql) ORDER BY vid""".stripMargin

  /** The [[gram]] oracle generator over the same table SQL. */
  def gramSql(tableSql: String, dim: Int): String =
    s"""WITH qx AS (
       |  SELECT vec_id, ui AS i,
       |    CAST(round(CAST(embedding[CAST(ui AS INT)] AS DOUBLE), 6) AS DECIMAL(18,6)) AS q
       |  FROM ($tableSql), (SELECT unnest(range(1, ${dim + 1})) AS ui)),
       |pairs AS (
       |  SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(a.q * b.q) AS DOUBLE) AS g
       |  FROM qx a JOIN qx b ON a.vec_id = b.vec_id AND a.i <= b.i
       |  GROUP BY 1, 2),
       |firsts AS (
       |  SELECT i, CAST(-1 AS BIGINT) AS j, CAST(count(*) AS BIGINT) AS cnt,
       |    CAST(sum(q) AS DOUBLE) AS g
       |  FROM qx GROUP BY 1)
       |SELECT i, j, cnt, g FROM pairs
       |UNION ALL SELECT i, j, cnt, g FROM firsts
       |ORDER BY i, j""".stripMargin
}
