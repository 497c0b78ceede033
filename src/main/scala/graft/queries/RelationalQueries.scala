package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational / analytical queries over the TPC-H-ish corpus. These are
  * the bench headliners: big scans + hash aggregates + broadcast joins.
  *
  * Float-determinism convention: money columns are summed as DECIMAL
  * (exact — both engines produce the identical rational, hence identical
  * DOUBLE after the final cast), never as floating point.
  */
object RelationalQueries {

  import ParityQueries.Q

  /** TPC-H Q1 shape: pricing summary. One scan of lineitem with the
    * shipdate predicate pushed to parquet, hash aggregate with map-side
    * partial combine over a 6-group key space — shuffle volume is O(6),
    * the plan scales linearly with input.
    */
  val pricingSummary: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val qty = col("l_quantity").cast("decimal(18,2)")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    val tax = col("l_tax").cast("decimal(18,2)")
    li.filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1).cast("decimal(18,2)") - disc)).cast("double").as("sum_disc_price"),
        sum(price * (lit(1).cast("decimal(18,2)") - disc) * (lit(1).cast("decimal(18,2)") + tax))
          .cast("double").as("sum_charge"),
        count(lit(1)).as("count_order")
      )
      .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 6))
      .withColumn("avg_price", round(col("sum_base_price") / col("count_order"), 6))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  count(*) AS count_order,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6 shape: forecast-revenue-change — a pure scan query. All
    * three predicates push to parquet (row-group + page skipping at
    * scale), only 4 columns are read, and the aggregate collapses to a
    * single row with map-side partials: the plan is bandwidth-bound on
    * the pruned scan, the ideal shape for a 100 TB fact table.
    */
  val revenueChange: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    li.filter(
        col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1997-01-01")) &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum(price * disc).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val revenueChangeSql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q4 shape: per-priority counts of orders with at least one
    * late line (shipped > 90 days after the order date). EXISTS
    * decorrelates to a LEFT SEMI join on the order key — each order
    * counted once however many lines are late, one fact-fact shuffle,
    * integer outputs (zero FP-parity surface).
    */
  val lateOrders: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
    o.join(li,
        o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late"))
      .orderBy("o_orderpriority")
  }

  val lateOrdersSql: String =
    """SELECT o_orderpriority, count(*) AS n_late
      |FROM orders o
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l
      |  WHERE l.l_orderkey = o.o_orderkey
      |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q3 shape: top-10 orders by revenue for one market segment.
    * customer (filtered) broadcasts into orders; the lineitem aggregate
    * is partial-combined before its single shuffle; top-k is a
    * TakeOrderedAndProject (no global sort materialization).
    */
  val topRevenueOrders: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    val rev = li.groupBy(col("l_orderkey"))
      .agg(sum(price * (lit(1).cast("decimal(18,2)") - disc)).cast("double").as("revenue"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(rev, o("o_orderkey") === rev("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("revenue"), col("o_orderstatus"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val topRevenueOrdersSql: String =
    """WITH rev AS (
      |  SELECT l_orderkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT o_orderkey, o_custkey, revenue, o_orderstatus
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN rev ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape: revenue by nation for one region — a 5-table join
    * chain. region→nation→supplier are tiny and broadcast; orders joins
    * lineitem on the shuffle; the final aggregate is a handful of
    * groups. The plan that matters at 100 TB: exactly ONE big-table
    * shuffle (lineitem ⋈ orders on orderkey), everything else broadcast.
    */
  val regionRevenue: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val price = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(18,2)")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .filter(c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(price * (lit(1).cast("decimal(18,2)") - disc)).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val regionRevenueSql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q18 shape: large-volume customers (groupBy + HAVING over a
    * big aggregate, re-joined to dims). The having-filter runs on the
    * aggregated (small) side before the dim joins.
    */
  val bigOrders: Q = (s, dir) => {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val qty = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
      .filter(col("total_qty") > 250.0)
    o.join(qty, o("o_orderkey") === qty("l_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(50)
  }

  val bigOrdersSql: String =
    """WITH q AS (
      |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0)
      |SELECT c_name, o_orderkey, o_totalprice, total_qty
      |FROM orders JOIN q ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey LIMIT 50""".stripMargin

  /** Event-stream rollup: per event_type stats (hash agg + distinct). */
  val eventTypeStats: Q = (s, dir) => {
    val e = Tables.events(s, dir)
    e.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        countDistinct(col("user_id")).as("n_users")
      )
      .orderBy("event_type")
  }

  val eventTypeStatsSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
      |  min(value) AS min_value, max(value) AS max_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Top-25 association rules (Association.rules) over order baskets:
    * parts co-bought in ≥2 orders, directed rules ranked by lift.
    * Counts off distinct presence; confidence and lift are each one
    * IEEE division of exact long products.
    */
  val assocRules: Q = (s, dir) =>
    graft.operators.Association.rules(
      graft.Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", minSupport = 2L, k = 25)

  val assocRulesSql: String =
    """WITH ti AS (SELECT DISTINCT l_orderkey AS t, l_partkey AS i FROM lineitem),
      |nt AS (SELECT count(DISTINCT t) AS n_txn FROM ti),
      |itn AS (SELECT i, count(*) AS n_i FROM ti GROUP BY 1),
      |p AS (
      |  SELECT x.i AS a, y.i AS b, count(*) AS n_ab
      |  FROM ti x JOIN ti y ON x.t = y.t AND x.i < y.i
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |d AS (SELECT a, b, n_ab FROM p UNION ALL SELECT b, a, n_ab FROM p)
      |SELECT d.a AS antecedent, d.b AS consequent,
      |  CAST(d.n_ab AS BIGINT) AS support,
      |  CAST(ia.n_i AS BIGINT) AS n_a, CAST(ib.n_i AS BIGINT) AS n_b,
      |  CAST(d.n_ab AS DOUBLE) / CAST(ia.n_i AS DOUBLE) AS confidence,
      |  CAST(nt.n_txn * d.n_ab AS DOUBLE) / CAST(ia.n_i * ib.n_i AS DOUBLE) AS lift
      |FROM d JOIN itn ia ON ia.i = d.a JOIN itn ib ON ib.i = d.b CROSS JOIN nt
      |ORDER BY lift DESC, antecedent, consequent LIMIT 25""".stripMargin

  /** Functional-dependency audit (Profile.fdAudit) of three candidate
    * FDs — one that holds (orders' key determines its customer) and
    * two the schema violates. Integer counts; the violation rate is
    * one IEEE division.
    */
  val fdAudit: Q = (s, dir) => {
    val o = graft.Tables.orders(s, dir)
    val l = graft.Tables.lineitem(s, dir)
    graft.operators.Profile.fdAudit(o, Seq("o_orderkey"), "o_custkey")
      .unionAll(graft.operators.Profile.fdAudit(l, Seq("l_orderkey"), "l_suppkey"))
      .unionAll(graft.operators.Profile.fdAudit(l, Seq("l_partkey"), "l_suppkey"))
      .orderBy("fd")
  }

  val fdAuditSql: String = {
    def one(table: String, lhs: String, rhs: String): String =
      s"""SELECT '$lhs -> $rhs' AS fd,
         |  CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
         |  CAST(max(nd) AS BIGINT) AS max_distinct,
         |  CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS violation_rate
         |FROM (SELECT $lhs, count(DISTINCT $rhs) AS nd FROM $table GROUP BY 1) g""".stripMargin
    s"""${one("orders", "o_orderkey", "o_custkey")}
       |UNION ALL
       |${one("lineitem", "l_orderkey", "l_suppkey")}
       |UNION ALL
       |${one("lineitem", "l_partkey", "l_suppkey")}
       |ORDER BY fd""".stripMargin
  }

  /** CUBE roll-up of lineitem volume by (returnflag, linestatus) —
    * every grouping-set margin in one pass (Spark rewrites the cube
    * into a single expanded aggregate; money sums through DECIMAL per
    * the oracle-parity rule).
    */
  val revenueCube: Q = (s, dir) =>
    graft.Tables.lineitem(s, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))

  val revenueCubeSql: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_fd_audit" -> fdAudit,
    "q_revenue_cube" -> revenueCube,
    "q_assoc_rules" -> assocRules,
    "q_pricing_summary" -> pricingSummary,
    "q_revenue_change" -> revenueChange,
    "q_late_orders" -> lateOrders,
    "q_top_revenue_orders" -> topRevenueOrders,
    "q_region_revenue" -> regionRevenue,
    "q_big_orders" -> bigOrders,
    "q_event_type_stats" -> eventTypeStats
  )

  val oracleSql: Map[String, String] = Map(
    "q_fd_audit" -> fdAuditSql,
    "q_revenue_cube" -> revenueCubeSql,
    "q_assoc_rules" -> assocRulesSql,
    "q_pricing_summary" -> pricingSummarySql,
    "q_revenue_change" -> revenueChangeSql,
    "q_late_orders" -> lateOrdersSql,
    "q_top_revenue_orders" -> topRevenueOrdersSql,
    "q_region_revenue" -> regionRevenueSql,
    "q_big_orders" -> bigOrdersSql,
    "q_event_type_stats" -> eventTypeStatsSql
  )
}
