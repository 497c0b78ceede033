package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Latest-value upsert semantics: a ralf feature table keeps exactly one
  * current record per primary key — every emitted record overwrites the
  * state entry for its key (reference: ralf/operator.py:236-259,
  * ralf/state/table_state.py:9-46).
  *
  * Batch formulation: `max_by(struct(cols), orderCol)` per key — a
  * two-phase aggregate with map-side partial combine: ONE shuffle of
  * (key -> current-best row), no window function. Each executor reduces
  * its input to one candidate row per key before the exchange, so
  * shuffle volume is O(distinct keys), not O(rows) — the property that
  * matters at 100 TB. (Struct-valued aggregation buffers aren't
  * hash-aggregable, so the physical operator is SortAggregate; the
  * in-partition sort is the price of carrying the whole row through
  * the aggregate.)
  */
object Upsert {

  /** Reduce `df` to the latest row per `key`, ordered by `ord`.
    * PRECONDITION: `ord` must be unique within each key (true for all
    * corpus order columns, e.g. event_id) — `max_by` ties would
    * otherwise be nondeterministic.
    */
  def latest(df: DataFrame, key: String, ord: Column): DataFrame = {
    val dataCols = df.columns.filter(_ != key)
    val packed = struct(dataCols.map(col).toIndexedSeq: _*)
    val agg = df
      .groupBy(col(key))
      .agg(
        max_by(packed, ord).as("_latest"),
        count(lit(1)).as("num_updates")
      )
    val unpacked = dataCols.map(c => col(s"_latest.$c").as(c))
    agg.select((col(key) +: unpacked :+ col("num_updates")).toIndexedSeq: _*)
  }

  /** Point query: the current value for one key (reference:
    * ralf/table.py:179-191 → Operator.get). With a materialized feature
    * table this is a key-filtered scan; filter pushdown + partition
    * pruning make it cheap. Laziness in ralf == an unevaluated plan here.
    */
  def pointQuery(featureTable: DataFrame, key: String, value: Any): DataFrame =
    featureTable.filter(col(key) === lit(value))

  /** Bulk query: all current values (reference: ralf/table.py:193-206). */
  def bulkQuery(featureTable: DataFrame, key: String): DataFrame =
    featureTable.orderBy(col(key))

  /** SCD2 history materialization: turn the update log the reference's
    * tables consume one record at a time (ralf/operator.py:236-259 —
    * each update overwrites its key's state) into the full row-level
    * version history: one `[valid_from, valid_to)` interval per
    * DISTINCT consecutive value of each key. No-change updates collapse
    * into their predecessor's interval (true slowly-changing-dimension
    * semantics); the current version carries `valid_to = NULL`.
    *
    * Plan: one hash partition on `key`, one (key, ord) sort, then TWO
    * window passes over the SAME spec — `lag(value)` marks change rows,
    * and after the change filter `lead(ord)` closes each interval.
    * The filter preserves distribution and ordering, so the second
    * WindowExec plans with no new exchange and no new sort: the whole
    * history is ONE shuffle of the update log regardless of key count
    * or update rate.
    *
    * PRECONDITION: `ord` unique per key (the upsert log contract).
    */
  def history(updates: DataFrame, key: String, ord: String, valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(valueCols.nonEmpty, "history needs at least one value column")
    val cols = updates.columns
    Seq("valid_from", "valid_to").foreach { n =>
      require(!cols.contains(n), s"updates already has a '$n' column")
    }
    val chg = graft.core.Names.fresh(cols.toSeq, "_chg")
    val w = Window.partitionBy(col(key)).orderBy(col(ord))
    val packed = struct(valueCols.map(col): _*)
    // struct() is never NULL, so the null-safe inequality marks each
    // key's first row (lag NULL) as a change with no extra guard
    updates
      .withColumn(chg, !(packed <=> lag(packed, 1).over(w)))
      .filter(col(chg))
      .select(
        (col(key) +: valueCols.map(col)) ++ Seq(
          col(ord).as("valid_from"),
          lead(col(ord), 1).over(w).as("valid_to")): _*)
  }

  /** Feature-staleness report — the reference's own research metric
    * (feature-store maintenance asks WHICH keys' served features lag
    * and by how much; the prioritization policies of
    * ralf/policies/processing_policy.py exist to bound exactly this).
    * For the latest-wins table fed by `updates`:
    * `staleness(key) = as_of − last_ord`, with `as_of` the log's
    * global max ord (the snapshot's "now").
    *
    * Shape: ONE map-side-combined per-key aggregate behind a
    * checkpoint barrier; `as_of` is a second 1-row aggregate OVER that
    * keys-many frame, equi-joined back on a constant key (AQE
    * broadcasts the 1-row side). Never a global window — that would
    * funnel every key through one task (the entropy lesson) — and the
    * barrier keeps the totals join from replanning the scan subtree.
    */
  def staleness(updates: DataFrame, key: String, ord: String): DataFrame = {
    val perKey = updates.groupBy(col(key))
      .agg(max(col(ord)).as("last_ord"), count(lit(1)).as("num_updates"))
      .withColumn("_k", lit(0))
      .localCheckpoint(false)
    val asOf = perKey.groupBy(col("_k").as("_tk")).agg(max(col("last_ord")).as("as_of"))
    perKey.join(asOf, col("_k") === col("_tk"))
      .select(col(key), col("last_ord"), col("num_updates"),
        (col("as_of") - col("last_ord")).as("staleness"))
  }

  /** Time-travel lookup against a [[history]] frame: the feature table
    * exactly as it stood at `at` — rows whose interval covers `at`
    * (`valid_from <= at < valid_to`, the open current version covering
    * everything since its `valid_from`). Equivalent to
    * `latest(updates.filter(ord <= at))` by construction, without
    * re-reducing the log: against a history PERSISTED with
    * `valid_from` range layout this is a pruned scan, not an aggregate.
    */
  def asAt(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))
}
