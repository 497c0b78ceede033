package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over (transaction, item) rows — the
  * frequently-bought-together surface (Agrawal & Srikant 1994's
  * support/confidence frame plus lift): for every directed item pair
  * (a → b) co-occurring in at least `minSupport` transactions,
  *   support    = n_ab            (co-occurrence count)
  *   confidence = n_ab / n_a      (P(b | a))
  *   lift       = N·n_ab / (n_a·n_b)   (observed / independence)
  * ranked by lift, ties (antecedent, consequent).
  *
  * Exactness: all counts are integers off distinct presence (an item
  * twice in one basket counts once); confidence and lift are each ONE
  * IEEE division of exact long products (never rounded — the
  * commonness discipline), so the DuckDB oracle replays them
  * bit-for-bit, and the lift ordering compares identical doubles.
  *
  * Scale shape: one distinct (txn, item) exchange (map-side combined)
  * feeds the pair self-join on the transaction key AND the per-item
  * counts behind a checkpoint barrier. Pair volume is Σ_txn b² with b
  * the basket's distinct size — baskets are small by nature (the
  * quadratic lives inside a transaction, never across the corpus);
  * `minSupport` prunes the pair tail before the item-count joins,
  * which stay UNhinted (item vocabularies scale with the catalog; AQE
  * broadcasts small ones at runtime). The global top-k resolves via
  * TakeOrderedAndProject.
  */
object Association {

  def rules(
      df: DataFrame,
      txnCol: String,
      itemCol: String,
      minSupport: Long,
      k: Int
  ): DataFrame = {
    require(minSupport > 0 && k > 0, s"minSupport, k must be positive, got $minSupport, $k")
    val ti = df.select(col(txnCol).as("t"), col(itemCol).as("i"))
      .distinct()
      .localCheckpoint(false) // feeds N, item counts AND both pair sides
    // ONE long — collected directly rather than crossJoin'd as a
    // single-row frame (a 1-row BroadcastNestedLoopJoin is harmless
    // but muddies the no-nested-loop plan pin; control-plane collects
    // re-enter as literals, repo note)
    val nTxn = ti.select(col("t")).distinct().count()
    val itemN = ti.groupBy(col("i")).agg(count(lit(1)).as("n_i"))
    val pairs = ti.as("x")
      .join(ti.as("y"), col("x.t") === col("y.t") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("a"), col("y.i").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    // undirected co-occurrence fans out to both directed rules AFTER
    // the aggregate — the expansion is pairs-sized, not events-sized
    val directed = pairs.select(col("a"), col("b"), col("n_ab"))
      .unionAll(pairs.select(col("b").as("a"), col("a").as("b"), col("n_ab")))
    directed
      .join(itemN.select(col("i").as("a"), col("n_i").as("n_a")), "a")
      .join(itemN.select(col("i").as("b"), col("n_i").as("n_b")), "b")
      .select(
        col("a").as("antecedent"), col("b").as("consequent"),
        col("n_ab").as("support"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence"),
        ((lit(nTxn) * col("n_ab")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("lift"))
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(k)
  }
}
