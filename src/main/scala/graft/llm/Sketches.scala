package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Corpus cardinality sketching over text content — the corpus-stats
  * report ("how many distinct n-gram spans does each source contribute?")
  * that exact `COUNT(DISTINCT ...)` can't afford at 100 TB: distinct
  * shingles are corpus-sized, so the exact aggregate shuffles the whole
  * value stream, while the KMV sketch ships O(k) longs per group and
  * answers within ≈1/√(k−2) relative error. Deterministic given the
  * hash — the oracle reproduces the sketch exactly (rank-k window over
  * distinct hashes), unlike HLL-class sketches whose register layouts
  * are engine-private.
  */
object Sketches {

  /** The KMV aggregate as a Column over an `array<bigint>` hash column. */
  def kmvAgg(hashes: Column, k: Int): Column =
    Bridge.column(
      graft.functions.KmvDistinct(Bridge.expression(hashes), k).toAggregateExpression())

  /** Per-group estimated distinct-shingle counts.
    *
    * Output per group: `n_mins` (sketch fill, = exact distinct count
    * while < k), `kth_min` (the k-th order statistic; −1 while the
    * sketch is unfilled) and `est_distinct` — exact when n_mins < k,
    * else (k−1)·P / h_k (one IEEE division, oracle-identical).
    *
    * Plan shape: ONE hash-aggregate keyed by the group; each task folds
    * its rows' hash arrays into an O(k) buffer, the exchange carries
    * ≤k longs per (task, group). No explode, no distinct shuffle.
    */
  /** The KMV estimate triple over a `(grp, mins)` sketch frame. */
  private def kmvEstimate(sketches: DataFrame, k: Int): DataFrame = {
    val p = graft.functions.StrHash.P
    val mins = col("mins")
    sketches.select(
      col("grp"),
      size(mins).cast("long").as("n_mins"),
      when(size(mins) === k, element_at(mins, k)).otherwise(lit(-1L)).as("kth_min"),
      when(size(mins) < k, size(mins).cast("double"))
        .otherwise(lit((k - 1).toLong * p).cast("double") /
          element_at(mins, k).cast("double"))
        .as("est_distinct"))
  }

  def distinctShingles(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      k: Int
  ): DataFrame =
    kmvEstimate(
      docs
        .groupBy(col(groupCol).as("grp"))
        .agg(kmvAgg(TextOps.shingleHashes(col(textCol)), k).as("mins")),
      k)

  /** Hierarchical KMV roll-up — the mergeability contract proved at the
    * query level: fine-grained (group, sub) sketches are built ONCE
    * from the raw stream, then merged up the hierarchy by re-feeding
    * the sketch ARRAYS to the same aggregate (a KMV sketch is a set of
    * hashes, and the bottom-k of a union of per-part bottom-k sets IS
    * the bottom-k of the union — restriction can only push a hash's
    * rank down, so every corpus-level min survives in its part's
    * sketch). Each level is therefore IDENTICAL to the sketch built
    * directly from the raw values, which is exactly what the DuckDB
    * oracle pins — and why the corpus re-aggregation costs O(groups·k)
    * instead of a second corpus scan.
    *
    * Output: one row per group plus one `totalLabel` row, each with the
    * [[distinctShingles]] estimate triple.
    *
    * The 100 TB shape: this is the roll-up reuse pattern the sketch
    * family exists for — per-slice sketches persist as tiny artifacts
    * (k longs each) and ANY coarser slicing (source → corpus, day →
    * month) is answered from the artifacts alone, never re-scanning the
    * corpus. Both merge levels still run as hash aggregates with
    * map-side partial combine, so the exchanges carry O(k) per group.
    */
  def distinctRollup(
      docs: DataFrame,
      groupCol: String,
      subCol: String,
      textCol: String,
      k: Int,
      totalLabel: String = "total"
  ): DataFrame = {
    val fine = docs
      .groupBy(col(groupCol).as("grp"), col(subCol).as("sub"))
      .agg(kmvAgg(TextOps.shingleHashes(col(textCol)), k).as("mins"))
    // groups × k longs — control-plane sized; checkpointed because both
    // the per-group output and the total row re-read it (signature-table
    // rule: localCheckpoint(false), storage frees on GC of the result)
    val perGroup = fine
      .groupBy(col("grp"))
      .agg(kmvAgg(col("mins"), k).as("mins"))
      .localCheckpoint(false)
    val total = perGroup
      .select(lit(totalLabel).as("grp"), col("mins"))
      .groupBy(col("grp"))
      .agg(kmvAgg(col("mins"), k).as("mins"))
    kmvEstimate(perGroup, k).unionAll(kmvEstimate(total, k))
  }

  /** The Misra–Gries aggregate as a Column over an `array<string>`
    * token column ([[graft.functions.HeavyHitters]]).
    */
  def heavyHittersAgg(tokens: Column, k: Int): Column =
    Bridge.column(
      graft.functions.HeavyHitters(Bridge.expression(tokens), k).toAggregateExpression())

  /** Per-group top terms from the Misra–Gries sketch: ONE hash-aggregate
    * keyed by the group — each task folds its rows' token arrays into k
    * counters, the exchange carries ≤k (term, count) pairs per (task,
    * group), and the top `top` survivors unpack with their rank. Never
    * a (group, term)-keyed shuffle: the economy
    * [[graft.queries.LlmQueries]]'s exact top-terms query pays that this
    * one doesn't. Exact (and oracle-deterministic) whenever a group's
    * distinct-term count stays ≤ sketchK; approximate with the MG
    * undercount bound n/(sketchK+1) beyond.
    */
  def topTermsSketch(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      sketchK: Int,
      top: Int
  ): DataFrame =
    unpackTopTerms(
      docs
        .groupBy(col(groupCol).as("grp"))
        .agg(heavyHittersAgg(TextOps.words(col(textCol)), sketchK).as("hh")),
      top)

  /** Top-`top` (rank, term, cnt) rows out of a `(grp, hh)` sketch frame. */
  private def unpackTopTerms(sketches: DataFrame, top: Int): DataFrame =
    sketches
      .select(col("grp"), posexplode(slice(col("hh"), 1, top)).as(Seq("pos", "e")))
      .select(
        col("grp"),
        (col("pos") + 1).cast("long").as("rank"),
        col("e.term").as("term"),
        col("e.cnt").as("cnt"))

  /** The Misra–Gries MERGE aggregate over an `array<struct<term,cnt>>`
    * sketch column ([[graft.functions.HeavyHittersMerge]]).
    */
  def heavyHittersMergeAgg(sketches: Column, k: Int): Column =
    Bridge.column(
      graft.functions.HeavyHittersMerge(Bridge.expression(sketches), k).toAggregateExpression())

  /** Hierarchical Misra–Gries roll-up: fine (group, sub) sketches built
    * once from the token stream, then merged to per-group and corpus
    * level by the mergeable-summaries MG merge
    * ([[heavyHittersMergeAgg]]) — per-slice sketches persist as ≤k
    * (term, cnt) pairs and ANY coarser slicing is answered from the
    * artifacts, never re-tokenizing the corpus. Below counter capacity
    * every level is the exact count map (the oracle-pinned regime);
    * beyond it the n/(k+1) undercount bound survives merging
    * (SketchSpec). Output: top terms per group plus the `totalLabel`
    * corpus rows.
    */
  def topTermsRollup(
      docs: DataFrame,
      groupCol: String,
      subCol: String,
      textCol: String,
      sketchK: Int,
      top: Int,
      totalLabel: String = "total"
  ): DataFrame = {
    val fine = docs
      .groupBy(col(groupCol).as("grp"), col(subCol).as("sub"))
      .agg(heavyHittersAgg(TextOps.words(col(textCol)), sketchK).as("hh"))
    val perGroup = fine
      .groupBy(col("grp"))
      .agg(heavyHittersMergeAgg(col("hh"), sketchK).as("hh"))
      .localCheckpoint(false)
    val total = perGroup
      .select(lit(totalLabel).as("grp"), col("hh"))
      .groupBy(col("grp"))
      .agg(heavyHittersMergeAgg(col("hh"), sketchK).as("hh"))
    unpackTopTerms(perGroup, top).unionAll(unpackTopTerms(total, top))
  }

  /** The deterministic sampling key for [[quantiles]]: the squared
    * strhash of the salted id — squaring scatters the affine tail of
    * the polynomial hash so sequential ids sample uniformly (the same
    * mix [[graft.operators.Shedding.sampleFractions]] uses), and the
    * salt decorrelates from every other hash-keyed draw in the library.
    */
  def sampleKey(idCol: Column): Column = {
    val h = graft.functions.GraftFunctions.strhash(concat(lit("qtl:"), idCol.cast("string")))
    pmod(h * h, lit(graft.functions.StrHash.P))
  }

  /** Per-group quantile estimates from a deterministic bottom-k-by-hash
    * sample ([[graft.functions.BottomKSample]]) — the `approx_percentile`
    * replacement whose result another engine can replay exactly.
    *
    * Output per group: `n_sample` plus one column per requested
    * quantile, each the sample's order statistic at index
    * floor(q·(m−1)) (0-based — the lower-nearest-rank estimate; pure
    * integer indexing, no interpolation, so both engines pick the
    * identical element). Error vs the true quantile is the usual
    * uniform-sample bound ~1/√k; exact whenever the group has ≤ k rows.
    */
  def quantiles(
      docs: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: Column,
      k: Int,
      qs: Seq[Double]
  ): DataFrame = {
    val agg = Bridge.column(graft.functions.BottomKSample(
      Bridge.expression(sampleKey(col(idCol))),
      Bridge.expression(valueCol.cast("double")),
      k).toAggregateExpression())
    quantileSelect(
      docs
        .groupBy(col(groupCol).as("grp"))
        .agg(agg.as("smp")),
      qs)
  }

  /** Order-statistic quantile columns over a `(grp, smp)` frame whose
    * `smp` is the ascending-sorted sample values.
    */
  private def quantileSelect(samples: DataFrame, qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0), s"quantiles must be in [0,1]: $qs")
    val m = size(col("smp"))
    // guard m = 0 (a group whose sampled values are all NULL — the
    // aggregate skips nulls): the order-statistic index would be 0 and
    // element_at throws on it; an empty sample has no quantiles
    val qCols = qs.map { q =>
      when(m > 0,
        element_at(col("smp"), (floor(lit(q) * (m - 1).cast("double")) + 1).cast("int")))
        .as(s"p${math.round(q * 100)}")
    }
    samples.select((col("grp") +: m.cast("long").as("n_sample") +: qCols): _*)
  }

  /** The pairs-retaining bottom-k aggregate over scalar (key, value)
    * input ([[graft.functions.BottomKPairs]]) and its array-input merge
    * twin ([[graft.functions.BottomKMerge]]).
    */
  def bottomKPairsAgg(keyCol: Column, valueCol: Column, k: Int): Column =
    Bridge.column(graft.functions.BottomKPairs(
      Bridge.expression(keyCol), Bridge.expression(valueCol), k).toAggregateExpression())

  def bottomKMergeAgg(pairs: Column, k: Int): Column =
    Bridge.column(
      graft.functions.BottomKMerge(Bridge.expression(pairs), k).toAggregateExpression())

  /** Hierarchical quantile-sketch roll-up: fine (group, sub) bottom-k
    * samples built once in PAIRS form (sampling key retained), then
    * merged to per-group and corpus level by re-aggregating the pair
    * arrays — the kept set is a pure function of the (key, value)
    * multiset, so every merged level is IDENTICAL to the sample a
    * direct pass over the raw values builds, which is what the DuckDB
    * oracle pins. Output: [[quantiles]]-shaped rows per group plus the
    * `totalLabel` corpus row; each level costs O(groups·k) after the
    * one fine-level scan.
    */
  def quantileRollup(
      docs: DataFrame,
      groupCol: String,
      subCol: String,
      idCol: String,
      valueCol: Column,
      k: Int,
      qs: Seq[Double],
      totalLabel: String = "total"
  ): DataFrame = {
    val fine = docs
      .groupBy(col(groupCol).as("grp"), col(subCol).as("sub"))
      .agg(bottomKPairsAgg(sampleKey(col(idCol)), valueCol.cast("double"), k).as("pairs"))
    val perGroup = fine
      .groupBy(col("grp"))
      .agg(bottomKMergeAgg(col("pairs"), k).as("pairs"))
      .localCheckpoint(false)
    val total = perGroup
      .select(lit(totalLabel).as("grp"), col("pairs"))
      .groupBy(col("grp"))
      .agg(bottomKMergeAgg(col("pairs"), k).as("pairs"))
    // pairs ride in key order; the order-statistics layout is the
    // value-sorted array — bit-identical to BottomKSample's eval
    def toSmp(df: DataFrame): DataFrame = df.select(
      col("grp"),
      array_sort(transform(col("pairs"), p => p.getField("value"))).as("smp"))
    quantileSelect(toSmp(perGroup), qs).unionAll(quantileSelect(toSmp(total), qs))
  }

  /** The bloom-build aggregate as a Column over a `bigint` key column
    * ([[graft.functions.BloomBuild]]).
    */
  def bloomAgg(keys: Column, numBits: Int, numHashes: Int): Column =
    Bridge.column(
      graft.functions.BloomBuild(Bridge.expression(keys), numBits, numHashes)
        .toAggregateExpression())

  /** OR-merge of already-built bloom artifacts
    * ([[graft.functions.BloomOr]]) — the roll-up form.
    */
  def bloomOrAgg(artifacts: Column): Column =
    Bridge.column(
      graft.functions.BloomOr(Bridge.expression(artifacts)).toAggregateExpression())

  /** Membership probe against a bloom artifact (false ⇒ definitely
    * absent; [[graft.functions.BloomContains]]).
    */
  def bloomContains(artifact: Column, key: Column): Column =
    Bridge.column(graft.functions.BloomContains(
      Bridge.expression(artifact), Bridge.expression(key)))

  /** Robust outlier detection — per-group median/MAD modified z-score
    * (Iglewicz & Hoaglin's 0.6745·(x−med)/MAD > 3.5 rule), with both
    * statistics read off the SAME deterministic bottom-k sample the
    * quantile sketch uses: the median is the sample's lower-median
    * order statistic, the MAD the lower median of the |x − med| array
    * — pure array arithmetic on the O(k) sample, no second scan and
    * no second shuffle. Mean/stddev z-scores break exactly when you
    * need them (the outliers inflate the stddev); median/MAD have a
    * 50% breakdown point.
    *
    * Output: only the flagged rows, with the group's (n_sample, med,
    * mad) and the modified z. Groups whose MAD is 0 (over half the
    * sample identical) flag nothing — documented, not NaN. Shape: one
    * sketch aggregate keyed by the group, the group-stats table joins
    * back broadcast (groups are vocabulary-sized), flagging is a
    * codegen'd filter on the scan.
    */
  def robustOutliers(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: Column,
      k: Int,
      threshold: Double = 3.5
  ): DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    val agg = Bridge.column(graft.functions.BottomKSample(
      Bridge.expression(sampleKey(col(idCol))),
      Bridge.expression(valueCol.cast("double")),
      k).toAggregateExpression())
    val m = size(col("smp"))
    val lowerMedian = (idx: Column, arr: Column) => element_at(arr, idx)
    val medIdx = ((m + lit(1)) / lit(2)).cast("int")
    // internal group alias avoids ambiguity when the caller's group
    // column is itself named "grp"
    val stats = df.groupBy(col(groupCol).as("_ro_grp")).agg(agg.as("smp"))
      .select(col("_ro_grp"), col("smp"), m.cast("long").as("n_sample"),
        when(m > 0, lowerMedian(medIdx, col("smp"))).as("med"))
      .select(col("_ro_grp"), col("n_sample"), col("med"),
        when(col("n_sample") > 0,
          lowerMedian(((col("n_sample") + lit(1)) / lit(2)).cast("int"),
            array_sort(transform(col("smp"), x => abs(x - col("med"))))))
          .as("mad"))
    df.join(broadcast(stats), col(groupCol) === col("_ro_grp"))
      .withColumn("value", valueCol.cast("double"))
      .withColumn("mz", lit(0.6745) * (col("value") - col("med")) / col("mad"))
      .filter(col("mad") > 0 && abs(col("mz")) > threshold)
      .select(col(groupCol), col(idCol), col("value"), col("n_sample"),
        col("med"), col("mad"), round(col("mz"), 6).as("mz"))
  }

  /** Skew advisor — the pre-join diagnosis for
    * [[graft.operators.Joins.saltedJoin]]: the table's heaviest join
    * keys and their row shares, with a salt recommendation whenever a
    * single key exceeds `saltThreshold` of the table (one hot key =
    * one straggler task however many partitions the shuffle has). ONE
    * aggregate over ONE scan: total count + a Misra–Gries top-key
    * sketch fold together map-side, the advisor rows unpack from the
    * single result row. Exact (oracle-pinned) while distinct keys stay
    * ≤ sketchK; MG's n/(k+1) undercount bound beyond.
    */
  def skewAdvisor(
      df: DataFrame,
      keyCol: String,
      sketchK: Int,
      top: Int,
      saltThreshold: Double = 0.1
  ): DataFrame = {
    require(top >= 1 && sketchK >= top, s"need sketchK >= top >= 1, got $sketchK/$top")
    val share = col("e.cnt").cast("double") / col("n").cast("double")
    df
      .agg(count(lit(1)).as("n"),
        heavyHittersAgg(array(col(keyCol).cast("string")), sketchK).as("hh"))
      .select(col("n"), posexplode(slice(col("hh"), 1, top)).as(Seq("pos", "e")))
      .select(
        (col("pos") + 1).cast("long").as("rank"),
        col("e.term").as("key"),
        col("e.cnt").as("cnt"),
        col("n").as("n_rows"),
        round(share, 6).as("share"),
        (share > saltThreshold).as("salt_recommended"))
  }

  /** The count-min aggregate as a Column over an `array<string>` token
    * column ([[graft.functions.CountMin]]) and its artifact-merge twin
    * ([[graft.functions.CountMinMerge]]).
    */
  def cmsAgg(tokens: Column, depth: Int, width: Int): Column =
    Bridge.column(graft.functions.CountMin(
      Bridge.expression(tokens), depth, width).toAggregateExpression())

  def cmsMergeAgg(sketches: Column): Column =
    Bridge.column(
      graft.functions.CountMinMerge(Bridge.expression(sketches)).toAggregateExpression())

  /** Point-frequency estimate out of a [[cmsAgg]] artifact column: the
    * minimum of the term's `depth` counters, routed by the SAME salted
    * strhash the aggregate folded with ([[graft.functions.CmsHash]] —
    * engine expression ≡ JVM fold ≡ DuckDB oracle, the frozen-hash
    * triple). Never an undercount; overcount ≤ e·n/width w.p.
    * 1 − e^−depth. Pure Column arithmetic — probing joins nothing.
    */
  def cmsEstimate(cms: Column, term: Column, depth: Int, width: Int): Column = {
    val perRow = (0 until depth).map { r =>
      val b = pmod(
        graft.functions.GraftFunctions.strhash(
          concat(lit(graft.functions.CmsHash.salt(r)), term.cast("string"))),
        lit(width.toLong))
      element_at(cms, (b + lit(r.toLong * width) + lit(1L)).cast("int"))
    }
    least(perRow: _*)
  }

  /** Per-group point-frequency estimates for a fixed probe-term list —
    * the "how often does THIS term occur per source" gauge
    * ([[topTermsSketch]] answers which terms are heavy; this answers
    * arbitrary terms, heavy or not, from the same one-scan economy).
    * ONE hash-aggregate keyed by the group (each task folds its token
    * arrays into the depth×width buffer in place — no explode; the
    * exchange carries depth×width longs per (task, group)), then the
    * probe terms unpack as a generator projection over the single
    * sketch row — never a (group, term) shuffle, never a second scan.
    * Output: (grp, term, est), estimates exact while a group's bucket
    * collisions are absent and ≥ truth always.
    */
  def termFrequencies(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      probes: Seq[String],
      depth: Int,
      width: Int
  ): DataFrame = {
    require(probes.nonEmpty, "termFrequencies needs at least one probe term")
    val sketches = docs
      .groupBy(col(groupCol).as("grp"))
      .agg(cmsAgg(TextOps.words(col(textCol)), depth, width).as("cms"))
    sketches
      .select(col("grp"), explode(array(probes.map(lit): _*)).as("term"), col("cms"))
      .select(col("grp"), col("term"),
        cmsEstimate(col("cms"), col("term"), depth, width).as("est"))
  }

  /** Hierarchical count-min roll-up — the [[distinctRollup]] economy
    * for point frequencies: fine (group, sub) sketches built once from
    * the token stream, merged up by ELEMENTWISE ADDITION (count-min
    * counters are linear, so every merged level is IDENTICAL to the
    * sketch a direct pass builds — no truncation, unlike MG). Output:
    * [[termFrequencies]]-shaped rows per group plus `totalLabel`
    * corpus rows.
    */
  def termFrequencyRollup(
      docs: DataFrame,
      groupCol: String,
      subCol: String,
      textCol: String,
      probes: Seq[String],
      depth: Int,
      width: Int,
      totalLabel: String = "total"
  ): DataFrame = {
    require(probes.nonEmpty, "termFrequencyRollup needs at least one probe term")
    val fine = docs
      .groupBy(col(groupCol).as("grp"), col(subCol).as("sub"))
      .agg(cmsAgg(TextOps.words(col(textCol)), depth, width).as("cms"))
    val perGroup = fine
      .groupBy(col("grp"))
      .agg(cmsMergeAgg(col("cms")).as("cms"))
      .localCheckpoint(false)
    val total = perGroup
      .select(lit(totalLabel).as("grp"), col("cms"))
      .groupBy(col("grp"))
      .agg(cmsMergeAgg(col("cms")).as("cms"))
    def probe(df: DataFrame): DataFrame = df
      .select(col("grp"), explode(array(probes.map(lit): _*)).as("term"), col("cms"))
      .select(col("grp"), col("term"),
        cmsEstimate(col("cms"), col("term"), depth, width).as("est"))
    probe(perGroup).unionAll(probe(total))
  }

  /** Join-cardinality estimation WITHOUT running the join — the
    * planner-style "how big would A ⋈ B be?" answer from two O(k)
    * sketches (Beyer et al. 2007's KMV set algebra): per side a KMV
    * sketch over the DISTINCT join-key hashes, the union sketch as the
    * bottom-k of the two sketch sets (the bottom-k of a union of
    * bottom-k sets IS the union's bottom-k), the Jaccard estimate as
    * the fraction of union-sketch members present in BOTH sides, and
    *
    *   inter ≈ jaccard · union,
    *   |A ⋈ B| ≈ inter · (rows_A / d_A) · (rows_B / d_B)
    *
    * — the uniform-frequency assumption every cost-based optimizer
    * starts from. Deterministic given the hash, so the DuckDB oracle
    * replays the sketches and arithmetic bit-for-bit.
    *
    * Scale shape: each side is ONE aggregate (count + an O(k) KMV
    * buffer, map-side combined — the exchange carries ≤ k longs per
    * task); the estimate itself is a 1×1 crossJoin of two single-row
    * frames and pure array arithmetic. The tables never co-shuffle —
    * that is the point.
    */
  def joinCardinality(
      left: DataFrame,
      leftKey: Column,
      right: DataFrame,
      rightKey: Column,
      k: Int = 256
  ): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val p = graft.functions.StrHash.P
    // the raw polynomial hash of a SHORT key ("12345") never wraps the
    // modulus — its values concentrate near zero and the order-statistic
    // estimator (which assumes uniform on [0, P)) inflates by orders of
    // magnitude (340× measured on sequential orderkeys). One squaring
    // (the Shedding sampling uniformizer) still carries arithmetic
    // structure from sequential keys (+49% measured); squaring TWICE
    // mod P mixes to within the estimator's own ±1/√(k−2) noise
    // (+4.5% at k=256, vs −6.4% for ideal uniform hashes on the same
    // draw). Collisions of the 4-to-1 map are negligible at sketch
    // scales.
    def keyHash(key: Column): Column = {
      val h = graft.functions.GraftFunctions.strhash(key.cast("string"))
      val q = pmod(h * h, lit(p))
      pmod(q * q, lit(p))
    }
    def side(df: DataFrame, key: Column, tag: String): DataFrame = df.agg(
      count(lit(1)).as(s"rows_$tag"),
      kmvAgg(array(keyHash(key)), k).as(s"mins_$tag"))
    def est(mins: Column): Column =
      when(size(mins) < k, size(mins).cast("double"))
        .otherwise(lit((k - 1).toLong * p).cast("double") /
          element_at(mins, k).cast("double"))
    val u = slice(array_sort(array_union(col("mins_a"), col("mins_b"))), 1, k)
    side(left, leftKey, "a").crossJoin(side(right, rightKey, "b"))
      .withColumn("mins_u", u)
      .withColumn("est_a", est(col("mins_a")))
      .withColumn("est_b", est(col("mins_b")))
      .withColumn("est_union", est(col("mins_u")))
      .withColumn("m_both",
        size(array_intersect(array_intersect(col("mins_u"), col("mins_a")),
          col("mins_b"))).cast("long"))
      .withColumn("jaccard_est",
        when(size(col("mins_u")) > 0,
          round(col("m_both").cast("double") / size(col("mins_u")).cast("double"), 6))
          .otherwise(lit(0.0)))
      .withColumn("inter_est",
        when(size(col("mins_u")) > 0,
          round(col("m_both").cast("double") / size(col("mins_u")).cast("double") *
            col("est_union"), 6))
          .otherwise(lit(0.0)))
      .withColumn("est_join_rows",
        when(col("est_a") > 0 && col("est_b") > 0,
          round(col("m_both").cast("double") / size(col("mins_u")).cast("double") *
            col("est_union") *
            (col("rows_a").cast("double") / col("est_a")) *
            (col("rows_b").cast("double") / col("est_b")), 6))
          .otherwise(lit(0.0)))
      .select(col("rows_a"), col("rows_b"),
        round(col("est_a"), 6).as("est_distinct_a"),
        round(col("est_b"), 6).as("est_distinct_b"),
        round(col("est_union"), 6).as("est_union"),
        col("m_both"), col("jaccard_est"), col("inter_est"), col("est_join_rows"))
  }
}
