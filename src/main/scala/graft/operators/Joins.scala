package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed joins with the reference's feature-table semantics
  * (ralf/operators/join.py:10-63). ralf's LeftJoin is a 2-stream keyed
  * join where the right side acts as a latest-value table and unmatched
  * left records buffer until a right record arrives, each buffered left
  * being consumed exactly once.
  *
  * Batch decomposition into two deterministic operators:
  *   - [[enrichLatest]]: every left record joins the right side's
  *     CURRENT (latest) value for its key — the steady-state semantics.
  *   - [[sequenceJoin]]: the exact consume-once buffer pairing — the
  *     i-th left record of a key pairs with the i-th right record of
  *     that key (arrival order), unpaired records drop out.
  */
object Joins {

  /** Floor division as (x - pmod(x, w)) div w: exact long arithmetic
    * (IntegralDivide — Column./ would detour through doubles), floor
    * (not truncate-toward-zero) semantics for negative ordinals, and
    * identical to DuckDB's integer `//`. Shared by every bucketed
    * non-equi join below.
    */
  private[operators] def floorDiv(x: Column, bucketWidth: Long): Column = {
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    Bridge.column(IntegralDivide(
      Bridge.expression((x - pmod(x, lit(bucketWidth))).cast("long")),
      Literal(bucketWidth)))
  }

  /** The wider of two ordinal types for [[asOfJoin]]'s tagged union —
    * equal types pass through; mixed NUMERIC types widen to the higher
    * precedence side (int+long → long, long+double → double) so a wide
    * right ordinal never silently narrows into the left's type (the
    * old behavior, which could misorder the union when a long ordinal
    * truncated to int). Mixed non-numeric types have no safe common
    * ordering — fail loudly.
    */
  private def widerOrdType(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType
  ): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    if (a == b) a
    else {
      val rank: Map[DataType, Int] = Map(
        ByteType -> 1, ShortType -> 2, IntegerType -> 3, LongType -> 4,
        FloatType -> 5, DoubleType -> 6)
      (rank.get(a), rank.get(b)) match {
        case (Some(ra), Some(rb)) => if (ra >= rb) a else b
        case _ => throw new IllegalArgumentException(
          s"asOfJoin ordinals have incompatible types $a vs $b; " +
            "cast them to a common orderable type first")
      }
    }
  }

  /** Left enrichment against the right side reduced to latest-per-key.
    * The reduction happens BEFORE the join, so the join input is
    * O(distinct right keys); when that is small (a dimension table or a
    * feature table with bounded key space) Spark broadcasts it and the
    * join costs zero shuffles on the big side.
    */
  def enrichLatest(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      rightOrd: Column,
      broadcastRight: Boolean = true
  ): DataFrame = {
    val latestRight = Upsert.latest(right, rightKey, rightOrd)
    val r = if (broadcastRight) broadcast(latestRight) else latestRight
    left.join(r, left(leftKey) === r(rightKey), "left")
  }

  /** Plain keyed left join against a dimension table (right side already
    * one-row-per-key). Small dim → broadcast hash join.
    */
  def dimLeftJoin(left: DataFrame, dim: DataFrame, leftKey: String, dimKey: String): DataFrame =
    left.join(broadcast(dim), left(leftKey) === dim(dimKey), "left")

  /** Point-in-time (as-of) join — the TRAINING-data variant of feature
    * enrichment: each left record pairs with the right side's latest
    * value at-or-before the left record's OWN order value, per key
    * ([[enrichLatest]] is the serving-time variant: the right side's
    * current value regardless of the left's time). Point-in-time
    * correctness is what keeps training features free of future
    * leakage.
    *
    * Plan: tag and union both sides, one hash-partition + in-partition
    * sort on (key, ord, side), then a running last-non-null window —
    * no join operator at all. Shuffle is O(left + right) rows and the
    * window frame is running (constant state), so this survives skewed
    * keys that would explode an equivalent range join. A right and left
    * record at the same ord pair up (right sorts first).
    *
    * Output: every left row + `asOfCol` (null when no right record
    * precedes it).
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftOrd: String,
      rightOrd: String,
      rightVal: String,
      asOfCol: String = "asof_value"
  ): DataFrame = {
    val leftCols = left.columns
    // collision-free staging names: withColumn silently replaces on
    // collision and the final drop would destroy the caller's column
    val rv = graft.core.Names.fresh(leftCols.toSeq, "_rv")
    val ir = graft.core.Names.fresh(leftCols.toSeq :+ rv, "_ir")
    val ordc = graft.core.Names.fresh(leftCols.toSeq ++ Seq(rv, ir), "_ord")
    val ordType = widerOrdType(left.schema(leftOrd).dataType, right.schema(rightOrd).dataType)
    val l = left
      .withColumn(rv, lit(null).cast(right.schema(rightVal).dataType))
      .withColumn(ir, lit(0))
      .withColumn(ordc, col(leftOrd).cast(ordType))
    val r = right.select(
      leftCols.map {
        case c if c == key => col(key)
        case c => lit(null).cast(left.schema(c).dataType).as(c)
      } ++ Seq(
        col(rightVal).as(rv),
        lit(1).as(ir),
        col(rightOrd).cast(ordType).as(ordc)): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ordc).asc, col(ir).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asOfCol, last(col(rv), ignoreNulls = true).over(w))
      .filter(col(ir) === 0)
      .drop(rv, ir, ordc)
  }

  /** One point-in-time feature timeline for [[trainingSet]]: `df` must
    * carry the spine's key column (same name), an ordinal column `ord`,
    * and the feature value `value`; the assembled training set exposes
    * it as column `name`.
    */
  final case class FeatureTimeline(df: DataFrame, ord: String, value: String, name: String)

  /** Training-set assembly — the feature store's historical-features
    * query (the batch counterpart of the reference's point/bulk serving
    * path, ralf/table.py:150-206, fed by the LeftJoin feature tables of
    * ralf/operators/join.py:10-63): every spine (label) record is
    * enriched with N features, each the latest value of its OWN
    * independently-updating timeline at-or-before the spine record's
    * ordinal. Point-in-time correctness per timeline is exactly
    * [[asOfJoin]]'s — no future leakage into any feature column.
    *
    * Scale shape: folding [[asOfJoin]] N times would cost N shuffles
    * and N window passes over an ever-wider spine. Instead ALL
    * timelines union with the spine in one pass — each contributes its
    * value in its own staged column, null elsewhere — so the plan is
    * ONE hash partition on the key, ONE in-partition sort on
    * (ord, side), and ONE WindowExec evaluating the N running
    * last-non-null frames together (constant state per frame). Shuffle
    * is O(spine + Σ timelines) rows regardless of N, and no join
    * operator appears at all.
    *
    * Tie semantics match [[asOfJoin]]: a feature record AT the spine
    * ordinal is visible (features sort before spine rows at equal ord).
    * Feature names must be distinct and must not collide with spine
    * columns; each timeline needs at most one record per (key, ord) —
    * two same-ord records of one timeline have no defined order.
    */
  def trainingSet(
      spine: DataFrame,
      key: String,
      spineOrd: String,
      features: Seq[FeatureTimeline]
  ): DataFrame = {
    require(features.nonEmpty, "trainingSet needs at least one feature timeline")
    val names = features.map(_.name)
    require(names.distinct == names, s"duplicate feature names: $names")
    val spineCols = spine.columns
    names.foreach { n =>
      require(!spineCols.contains(n), s"feature name '$n' collides with a spine column")
    }
    val ir = graft.core.Names.fresh(spineCols.toSeq ++ names, "_ir")
    val ordc = graft.core.Names.fresh(spineCols.toSeq ++ names :+ ir, "_ord")
    val ordType = features.foldLeft(spine.schema(spineOrd).dataType) { (t, f) =>
      widerOrdType(t, f.df.schema(f.ord).dataType)
    }
    val valueType: Map[String, org.apache.spark.sql.types.DataType] =
      features.map(f => f.name -> f.df.schema(f.value).dataType).toMap
    val spineSide = spine.select(
      spineCols.map(col).toSeq ++
        names.map(n => lit(null).cast(valueType(n)).as(n)) ++
        Seq(lit(0).as(ir), col(spineOrd).cast(ordType).as(ordc)): _*)
    val featureSides = features.map { f =>
      f.df.select(
        spineCols.map {
          case c if c == key => col(key)
          case c => lit(null).cast(spine.schema(c).dataType).as(c)
        }.toSeq ++
          names.map {
            case n if n == f.name => col(f.value).as(n)
            case n => lit(null).cast(valueType(n)).as(n)
          } ++
          Seq(lit(1).as(ir), col(f.ord).cast(ordType).as(ordc)): _*)
    }
    val w = Window.partitionBy(col(key))
      .orderBy(col(ordc).asc, col(ir).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    featureSides.foldLeft(spineSide)(_ unionByName _)
      .select(
        spineCols.map(col).toSeq ++
          names.map(n => last(col(n), ignoreNulls = true).over(w).as(n)) :+
          col(ir): _*)
      .filter(col(ir) === 0)
      .drop(ir)
  }

  /** Bucketed range join: pair left rows (point `ordCol`) with right
    * rows (interval `[startCol, endCol]`, inclusive) sharing `key`,
    * where `start <= ord <= end` — the attribution-window /
    * sensor-interval shape. Spark's native plan for a non-equi range
    * predicate is a broadcast-nested-loop or cartesian filter —
    * O(left × right) work at scale even when few pairs survive.
    *
    * Scale shape: chunk the range axis into `bucketWidth`-wide buckets.
    * Each left row lands in EXACTLY ONE bucket (floor division, exact
    * long arithmetic — never a double, ordinals exceed 2^53 at corpus
    * scale); each interval explodes to the buckets it covers (fan-out =
    * intervalLength/width + 1). The join becomes a plain equi-join on
    * (key, bucket) — hash-partitioned, AQE-skew-splittable — with the
    * exact BETWEEN filter on top. A (point, interval) pair can meet
    * only in the point's single bucket, so no dedup stage is needed.
    * Pick `bucketWidth` near the typical interval length: per-interval
    * fan-out stays O(1) while buckets hold ~width-worth of points;
    * cap or split long-tail intervals upstream if their length is
    * unbounded.
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ordCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val bkt = graft.core.Names.fresh(left.columns.toSeq ++ right.columns, "_bkt")
    val l = left.withColumn(bkt, floorDiv(col(ordCol), bucketWidth))
    val r = right
      .filter(col(startCol) <= col(endCol)) // malformed intervals match nothing
      .withColumn(bkt, explode(sequence(
        floorDiv(col(startCol), bucketWidth), floorDiv(col(endCol), bucketWidth))))
    l.join(r, Seq(key, bkt))
      .filter(col(ordCol) >= col(startCol) && col(ordCol) <= col(endCol))
      .drop(bkt)
  }

  /** Bucketed interval-overlap join: pair left intervals
    * `[lStart, lEnd]` with right intervals `[rStart, rEnd]` sharing
    * `key` where the intervals OVERLAP (`lStart <= rEnd && rStart <=
    * lEnd`, inclusive) — the both-sides-are-ranges sibling of
    * [[rangeJoin]] (meeting/booking conflicts, span intersection,
    * co-occurrence windows). Spark's native plan for the two-sided
    * non-equi predicate is again a nested-loop/cartesian filter.
    *
    * Scale shape: BOTH sides explode to the `bucketWidth`-wide buckets
    * they cover (fan-out = len/width + 1 each), meet in a plain
    * (key, bucket) equi-join, and apply the exact overlap filter. An
    * overlapping pair shares EVERY bucket of its intersection, so the
    * join would emit it once per shared bucket; instead of a
    * distinct-shuffle dedup, each pair is kept only in its overlap's
    * FIRST bucket (`bucket == floorDiv(max(lStart, rStart))` — a
    * bucket both sides necessarily cover), making the output
    * duplicate-free by construction with zero extra shuffles. All
    * bucket arithmetic is exact long floor division, as in
    * [[rangeJoin]].
    */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      lStartCol: String,
      lEndCol: String,
      rStartCol: String,
      rEndCol: String,
      bucketWidth: Long
  ): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val bkt = graft.core.Names.fresh(left.columns.toSeq ++ right.columns, "_bkt")
    def explodeSide(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(s) <= col(e)) // malformed intervals match nothing
        .withColumn(bkt, explode(sequence(
          floorDiv(col(s), bucketWidth), floorDiv(col(e), bucketWidth))))
    explodeSide(left, lStartCol, lEndCol)
      .join(explodeSide(right, rStartCol, rEndCol), Seq(key, bkt))
      .filter(
        col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol) &&
          col(bkt) === floorDiv(greatest(col(lStartCol), col(rStartCol)), bucketWidth))
      .drop(bkt)
  }

  /** Skew-safe equi-join for a HOT-KEY big side against a
    * non-broadcastable-but-smaller right side: the big side salts its
    * key with `pmod(xxhash64(saltBy), saltFactor)` (pick `saltBy` as a
    * column that varies WITHIN a key — an event/row id — so one hot
    * key's rows spread across `saltFactor` partitions), the right side
    * replicates once per salt, and the join runs on (key, salt). Each
    * big row meets exactly the one replica carrying its salt, so the
    * result is row-for-row the plain join — only the partitioning
    * changes. This is the manual form of AQE's skew split for the
    * cases AQE can't see (skew born mid-stage, or a persisted layout);
    * prefer `broadcast()` when the right side fits.
    */
  def saltedJoin(
      big: DataFrame,
      right: DataFrame,
      key: String,
      saltBy: Column,
      saltFactor: Int
  ): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive, got $saltFactor")
    val s = graft.core.Names.fresh(big.columns.toSeq ++ right.columns, "_salt")
    val b = big.withColumn(s, pmod(xxhash64(saltBy), lit(saltFactor.toLong)))
    val r = right.withColumn(s,
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1L))))
    b.join(r, Seq(key, s)).drop(s)
  }

  /** Exact consume-once pairing (ralf/operators/join.py:35-56): left
    * records buffer per key; each arriving right record consumes the
    * oldest buffered left. In arrival order this pairs the i-th left
    * with the i-th right of each key. Implemented as row_number on both
    * sides + equi-join on (key, rn) — two hash-partition shuffles on the
    * same key, which Catalyst co-locates (the second exchange is reused).
    */
  def sequenceJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftOrd: String,
      rightOrd: String,
      leftPrefix: String = "l_",
      rightPrefix: String = "r_"
  ): DataFrame = {
    def number(df: DataFrame, ord: String, prefix: String): DataFrame = {
      val renamed = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, prefix + c))
      renamed.withColumn("_seq", row_number().over(
        Window.partitionBy(col(prefix + key)).orderBy(col(prefix + ord))
      ))
    }
    val l = number(left, leftOrd, leftPrefix)
    val r = number(right, rightOrd, rightPrefix)
    l.join(
      r,
      l(leftPrefix + key) === r(rightPrefix + key) && l("_seq") === r("_seq"),
      "inner"
    ).drop(r(rightPrefix + key)).drop(r("_seq"))
  }

  /** All deletion-neighborhood variants of `str`, hashed: the string
    * itself plus every single-character deletion, each reduced to
    * xxhash64 immediately so the variant TEXT never leaves the
    * projection. Two strings within edit distance 1 always share a
    * variant (equal → the string itself; substitution at i → both
    * sides' del_i; insertion/deletion → the shorter string equals one
    * deletion of the longer), so joining on variant hashes is a
    * LOSSLESS candidate superset — the FastSS / SymSpell blocking
    * scheme — and 64-bit hash collisions only ever ADD candidates,
    * which the exact confirm filter removes.
    */
  private def delVariantHashes(str: Column): Column = {
    val idxs = when(length(str) > 0, sequence(lit(1), length(str)))
      .otherwise(array().cast("array<int>"))
    val dels = transform(idxs, i =>
      concat(str.substr(lit(1), i - 1), str.substr(i + 1, length(str) - i)))
    array_distinct(transform(concat(array(str), dels), v => xxhash64(v)))
  }

  /** Fuzzy (edit-distance) equi-style join — record linkage without a
    * nested loop. Emits every (left, right) pair whose strings are
    * within `maxDist` Levenshtein edits, found via deletion-neighborhood
    * blocking: each side explodes to ~len+1 variant HASHES (16 bytes a
    * row — the exchange carries ids and hashes, never variant text),
    * candidates are the hash-equal pairs, and an exact
    * `levenshtein(a, b) <= maxDist` confirm makes the output identical
    * to the naive all-pairs join (the OperatorSpec equivalence).
    *
    * Currently `maxDist = 1` (single-deletion neighborhood); deeper
    * radii need the recursive deletion set (SymSpell) or PassJoin
    * segment blocking — same join shape, bigger neighborhoods.
    *
    * Scale shape: one variant-hash equi-join (never a cross product),
    * `distinct` on candidate id pairs BEFORE strings re-attach, so
    * full text only shuffles for confirmed candidates. A
    * corpus-frequent string (boilerplate titles) makes its variant
    * hashes hot keys — cap or pre-dedup exact duplicates first
    * (Dedup.exact) as the pipeline normally does anyway.
    */
  def fuzzyJoin(
      left: DataFrame,
      right: DataFrame,
      leftId: String,
      rightId: String,
      leftStr: String,
      rightStr: String,
      maxDist: Int = 1
  ): DataFrame = {
    require(maxDist == 1,
      s"deletion-neighborhood blocking is exact for maxDist = 1 only, got $maxDist")
    val lv = left
      .select(col(leftId).as("id_a"),
        explode(delVariantHashes(col(leftStr))).as("vh"))
    val rv = right
      .select(col(rightId).as("id_b"),
        explode(delVariantHashes(col(rightStr))).as("vh"))
    val cand = lv.join(rv, "vh").select(col("id_a"), col("id_b")).distinct()
    cand
      .join(left.select(col(leftId).as("id_a"), col(leftStr).as("str_a")), "id_a")
      .join(right.select(col(rightId).as("id_b"), col(rightStr).as("str_b")), "id_b")
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"), col("dist"))
  }

  /** Self-join form of [[fuzzyJoin]]: unordered near-duplicate pairs
    * (id_a < id_b) within one table — the entity-resolution shape
    * (near-identical titles / names / addresses).
    */
  def fuzzySelfPairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int = 1
  ): DataFrame =
    fuzzyJoin(df, df, idCol, idCol, strCol, strCol, maxDist)
      .filter(col("id_a") < col("id_b"))
}
