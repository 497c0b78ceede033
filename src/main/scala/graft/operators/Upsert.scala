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
}
