package graft.core

/** Collision-free temporary column names. Operators that stage helper
  * columns (`asOfJoin`'s row-value/is-right markers, `Skew.saltedJoin`'s
  * salt, `BucketedDir`'s bucket id) must not silently overwrite a column
  * the caller already has — `withColumn` replaces on name collision and
  * the final `drop` would then destroy user data.
  */
object Names {

  /** A name not present in `existing`: `base` if free, else `base_1`,
    * `base_2`, ... (first free suffix).
    */
  def fresh(existing: Seq[String], base: String): String =
    if (!existing.contains(base)) base
    else Iterator.from(1).map(i => s"${base}_$i").find(n => !existing.contains(n)).get
}
