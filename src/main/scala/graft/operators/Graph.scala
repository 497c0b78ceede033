package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames. First member:
  * PageRank (Page et al. 1999, "The PageRank Citation Ranking") — the
  * classic link-quality signal web-curation pipelines rank domains
  * with (harmonic-centrality stand-in at Common-Crawl scale).
  *
  * Cross-engine FP discipline — fixed-point, not round(): ranks live
  * as BIGINT nano-units (Σ ≈ 1e9) between iterations. Every
  * quantization is `floor(x + 0.5)` over doubles produced by an
  * IDENTICAL operation sequence in both engines — multiplication,
  * division, floor are single IEEE ops with no rounding-mode freedom,
  * so the quantized longs are bit-identical by construction. (The
  * first cut used round(x, 9)→DECIMAL; DuckDB's double round() is a
  * scaled multiply-round whose last ulp disagrees with Java's
  * BigDecimal HALF_UP often enough that ~200k quantizations per
  * iteration drifted the 9th decimal. floor-based fixed-point has no
  * such freedom.) All sums are exact integer arithmetic, so shuffle
  * order cannot matter and errors cannot compound differently.
  *
  * Scale shape: one shuffle per iteration — the per-source share
  * (rank/outdeg) joins the edge list on `src` (both sides partitioned
  * by the same key) and partial-aggregates into per-`dst` BIGINT sums
  * below the exchange (8-byte rank units, never doubles or decimals,
  * through the wire). The dangling-mass correction is a one-row exact
  * aggregate crossJoin'd back (broadcast, never a driver collect
  * inside the loop), and each iteration ends in a lazy
  * `localCheckpoint(false)` — without it the two references to the
  * previous round's ranks (shares + dangling scan) double the plan
  * per iteration, and at cluster scale the checkpoint is what caps
  * lineage/recovery depth for long power-iteration runs.
  */
object Graph {

  private val Scale = 1000000000L // nano-rank units

  /** PageRank over a directed edge list. Returns (node, rank) with
    * rank = nano-units / 1e9 as double; Σ ranks ≈ 1. Duplicate edges
    * are collapsed first (each distinct (src, dst) link contributes
    * once — the citation-graph convention); dangling nodes (in-links
    * only) redistribute their mass uniformly each round, per the
    * paper.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5,
      damping: Double = 0.85
  ): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters must be in 1..50, got $iters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint(false)
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // node count: a control-plane scalar (one distributed agg). The
    // driver-side doubles below repeat the exact op sequence the
    // oracle runs in-engine (floor(1e9/n + 0.5), ((1-d)/n)*1e9), so
    // the shared constants are bit-identical without shipping n.
    val n = nodes.count()
    val r0 = math.floor(Scale.toDouble / n + 0.5).toLong
    val baseScaled = (1.0 - damping) / n * Scale.toDouble

    var r = nodes.select(col("node"), lit(r0).as("rank"))
    for (_ <- 1 to iters) {
      val share = r.join(outdeg, col("node") === col("src"))
        .select(col("src").as("s"),
          floor(col("rank").cast("double") / col("deg").cast("double") + lit(0.5))
            .as("share"))
      val contrib = e.join(share, col("src") === col("s"))
        .groupBy(col("dst").as("cnode"))
        .agg(sum(col("share")).as("csum"))
      val dang = r.join(outdeg.select(col("src")), col("node") === col("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dsum"))
        .select(floor(col("dsum").cast("double") / lit(n.toDouble) + lit(0.5))
          .as("dshare"))
      r = nodes
        .join(contrib, col("node") === col("cnode"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          floor(
            lit(baseScaled) +
              lit(damping) * (coalesce(col("csum"), lit(0L)) + col("dshare")).cast("double") +
              lit(0.5)).as("rank"))
        .localCheckpoint(false)
    }
    r.select(col("node"),
      (col("rank").cast("double") / lit(Scale.toDouble)).as("rank"))
  }

  /** The DuckDB oracle for [[pageRank]], unrolled: `edgesSql` must
    * yield (src, dst) rows. Generated from the same constants so both
    * engines run bit-identical arithmetic; kept next to the operator
    * so the two can never drift.
    */
  def pageRankSql(edgesSql: String, iters: Int = 5, damping: Double = 0.85): String = {
    val d = s"CAST(${new java.math.BigDecimal(damping).toPlainString} AS DOUBLE)"
    val oneMinus =
      s"CAST(${new java.math.BigDecimal(1.0 - damping).toPlainString} AS DOUBLE)"
    val nD = "(SELECT CAST(n AS DOUBLE) FROM nn)"
    val sb = new StringBuilder
    sb.append(
      s"""WITH e AS (SELECT DISTINCT src, dst FROM ($edgesSql)),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
         |outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY 1),
         |r0 AS (SELECT node,
         |  CAST(floor(CAST($Scale AS DOUBLE) / $nD + 0.5) AS BIGINT) AS rank
         |  FROM nodes)""".stripMargin)
    for (i <- 1 to iters) {
      val prev = s"r${i - 1}"
      sb.append(",\n")
      sb.append(
        s"""sh$i AS (SELECT r.node AS s,
           |  CAST(floor(CAST(r.rank AS DOUBLE) / CAST(od.deg AS DOUBLE) + 0.5)
           |    AS BIGINT) AS share
           |  FROM $prev r JOIN outdeg od ON od.src = r.node),
           |cs$i AS (SELECT e.dst AS cnode, CAST(SUM(sh.share) AS BIGINT) AS csum
           |  FROM e JOIN sh$i sh ON sh.s = e.src GROUP BY 1),
           |dg$i AS (SELECT CAST(floor(
           |    CAST(COALESCE(SUM(r.rank), 0) AS DOUBLE) / $nD + 0.5) AS BIGINT) AS dshare
           |  FROM $prev r WHERE r.node NOT IN (SELECT src FROM outdeg)),
           |r$i AS (SELECT nd.node,
           |  CAST(floor($oneMinus / $nD * CAST($Scale AS DOUBLE) +
           |      $d * CAST(COALESCE(cs.csum, 0) + dg.dshare AS DOUBLE) +
           |      0.5) AS BIGINT) AS rank
           |  FROM nodes nd
           |  LEFT JOIN cs$i cs ON cs.cnode = nd.node
           |  CROSS JOIN dg$i dg)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT node, CAST(rank AS DOUBLE) / CAST($Scale AS DOUBLE) AS rank
         |FROM r$iters ORDER BY node""".stripMargin)
    sb.toString
  }
}
