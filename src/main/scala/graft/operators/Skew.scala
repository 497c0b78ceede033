package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for keyed joins. AQE's skew-join split re-plans a
  * sort-merge join at runtime when a partition overshoots; explicit
  * salting is the deterministic layout for the cases AQE can't touch —
  * broadcast-ineligible dimension joins against a hot key, or bucketed /
  * pre-partitioned tables whose layout must be decided at write time.
  */
object Skew {

  /** Salted inner equi-join: the big side's rows get a deterministic
    * salt in [0, factor) hashed from `saltBy` (any column that varies
    * within a key — a row id, an order column), the small side is
    * replicated across all `factor` salts, and the join key widens to
    * (key, salt) — a hot key's rows spread over `factor` tasks instead
    * of landing on one. Result-identical to `big.join(small, key)`
    * (inner), at the cost of factor× the small side's shuffle volume.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltBy: Column,
      factor: Int
  ): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // collision-free salt name: a caller's own "_salt" column must not
    // be overwritten (and then dropped) by the staging column
    val salt = graft.core.Names.fresh(big.columns.toSeq ++ small.columns, "_salt")
    val b = big.withColumn(salt, pmod(hash(saltBy), lit(factor)))
    val s = small.withColumn(salt, explode(sequence(lit(0), lit(factor - 1))))
    b.join(s, Seq(key, salt)).drop(salt)
  }
}
