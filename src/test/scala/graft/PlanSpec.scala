package graft

import graft.queries.{ParityQueries, RelationalQueries}

/** Physical-plan regression guards: the scale properties the engine
  * depends on (parquet pushdown, column pruning, broadcast joins,
  * partial aggregation, top-k without global sort) must survive query
  * edits — a correct-but-full-scan plan is a regression even when the
  * oracle still matches.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pricing summary: shipdate filter pushed to parquet, columns pruned") {
    val plan = RelationalQueries.pricingSummary(spark, dir).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "filter must reach the parquet scan")
    assert(!plan.contains("l_partkey"), "unused columns must be pruned from the scan")
  }

  test("latest-wins upsert: two-phase aggregate, partial combine BEFORE the exchange") {
    // Struct-valued aggregation buffers aren't hash-aggregable, so
    // max_by(struct, ord) plans as SortAggregate — acceptable. The
    // property that must hold at scale is the partial (map-side) phase
    // below the exchange: shuffle volume O(distinct keys), not O(rows).
    val plan = planOf(ParityQueries.latestFeature(spark, dir))
    assert(plan.contains("partial_max_by"), s"expected map-side partial combine, got:\n$plan")
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("partial_max_by")
    assert(exIdx >= 0 && partialIdx > exIdx,
      "partial aggregate must sit below (after in plan text) the hash exchange")
  }

  test("top revenue orders: dims broadcast, top-k is TakeOrderedAndProject") {
    val plan = planOf(RelationalQueries.topRevenueOrders(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), "filtered customer dim must broadcast")
    assert(plan.contains("TakeOrderedAndProject"), "limit+sort must fuse, no global sort")
  }

  test("point query: key predicate pushed into the parquet scan") {
    val plan = planOf(ParityQueries.pointQuery(spark, dir))
    assert(plan.contains("PushedFilters: [IsNotNull(user_id), EqualTo(user_id,7)]"),
      "point-query key must reach the scan (lazy-table semantics)")
  }

  test("revenue change (Q6 shape): all predicates pushed, 4-column scan") {
    val plan = planOf(RelationalQueries.revenueChange(spark, dir))
    // plan text truncates the PushedFilters list; the shipdate filter
    // head plus the exact 4-column ReadSchema prove pushdown + pruning
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"Q6 predicates must reach the parquet scan:\n$plan")
    assert(plan.contains(
      "ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"),
      s"only the 4 referenced columns may be read:\n$plan")
  }

  test("as-of join: one hash exchange, no join operator") {
    val plan = planOf(ParityQueries.asofJoin(spark, dir))
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one hash exchange, got $exchanges:\n$plan")
  }

  test("IVF top-k: quantization materialized once — no crossJoin left in the final plan") {
    // `ranked` (corpus × centroids crossJoin + per-vid window) feeds both
    // the assignment and the probe branches; the localCheckpoint barrier
    // means the final plan reads the checkpointed RDD twice instead of
    // planning the O(n×centroids) stage twice (VERDICT r2 "wrong" #3).
    val df = graft.llm.Similarity.ivfTopK(
      graft.Tables.embeddings(spark, dir), "vec_id", "embedding",
      org.apache.spark.sql.functions.col("vid") <= 5, k = 5, nProbe = 4)
    val plan = planOf(df)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"quantization crossJoin must be behind the checkpoint barrier, not re-planned:\n$plan")
    assert("Scan ExistingRDD".r.findAllIn(plan).length >= 2,
      s"both branches must read the checkpointed quantization:\n$plan")
  }

  test("dim join broadcasts the dimension side") {
    val plan = planOf(ParityQueries.dimJoin(spark, dir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), "customer dim must not shuffle")
  }

  /** Run `body` with broadcast thresholds at -1 — simulating a side too
    * big to broadcast. A `broadcast()` hint overrides the threshold, so
    * any broadcast surviving here is a FORCED one (the VERDICT r3
    * 100×-scale hazard: forcing a broadcast of an O(corpus) set).
    */
  private def withNoAutoBroadcast[A](body: => A): A = {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("canonicalize: losers anti-join is NOT hint-broadcast (unbounded at 100 TB)") {
    withNoAutoBroadcast {
      import spark.implicits._
      val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
      val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
      val plan = planOf(graft.llm.Dedup.canonicalize(docs, "doc_id", pairs))
      assert(!plan.contains("Broadcast"),
        s"losers set is O(near-dups) — must degrade to a shuffled anti-join:\n$plan")
      assert(plan.contains("LeftAnti"), s"anti-join must survive:\n$plan")
    }
  }

  test("decontaminateAgainst: quarantine anti-join is NOT hint-broadcast") {
    withNoAutoBroadcast {
      import spark.implicits._
      val docs = Seq((1L, "x y z"), (2L, "p q r")).toDF("doc_id", "text")
      val eval = Seq(Tuple1("x y z")).toDF("text")
      val plan = planOf(graft.llm.CorpusFrame(docs, "doc_id", "text")
        .decontaminateAgainst(eval, maxOverlap = 0.5).result)
      // the eval-shingle probe join legitimately keeps its hint
      // (benchmarks are tiny); the doc-id quarantine join must not
      assert(!plan.matches("(?s).*Broadcast\\w*Join[^\\n]*LeftAnti.*"),
        s"dirty set is O(contaminated docs) — quarantine must be a shuffled anti-join:\n$plan")
      assert(plan.contains("LeftAnti"), s"anti-join must survive:\n$plan")
    }
  }

  test("tfIdf: vocabulary join is NOT hint-broadcast") {
    withNoAutoBroadcast {
      import spark.implicits._
      val docs = Seq((1L, "x y z"), (2L, "x q r")).toDF("doc_id", "text")
      val plan = planOf(graft.llm.Relevance.tfIdf(spark, docs, "doc_id", "text", k = 3))
      // broadcast(n_docs) (a single-row scalar) is the only legitimate
      // broadcast left; the term-keyed df join must shuffle
      assert(!plan.contains("BroadcastHashJoin"),
        s"web-scale vocabularies are unbounded — df join must shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"),
        s"df join must degrade to a shuffle join when not broadcastable:\n$plan")
    }
  }

  test("KMV sketch: partial aggregation below the exchange, 2-column scan") {
    val plan = planOf(
      graft.llm.Sketches.distinctShingles(Tables.documents(spark, dir), "source", "text", 64))
    // the whole point of the sketch: each task folds its partition into
    // an O(k) buffer and the shuffle carries sketches, not values
    assert(plan.contains("partial_graft_kmv_distinct"),
      s"map-side partial sketch must run below the exchange:\n$plan")
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("partial_graft_kmv_distinct")
    assert(exIdx >= 0 && partialIdx > exIdx,
      "partial sketch must sit below (after in plan text) the hash exchange")
    assert(plan.contains("ReadSchema: struct<text:string,source:string>"),
      s"only text+source may be read:\n$plan")
  }

  test("KMV roll-up: partial sketch aggregation below BOTH merge exchanges") {
    import org.apache.spark.sql.functions._
    import graft.llm.{Sketches, TextOps}
    // the un-checkpointed roll-up shape (distinctRollup itself barriers
    // behind a localCheckpoint): fine (grp, sub) sketches re-aggregated
    // per grp — both levels must partial-combine map-side so each
    // exchange carries O(k) longs per group, not raw values
    val docs = Tables.documents(spark, dir)
    val fine = docs.groupBy(col("source").as("grp"), col("lang").as("sub"))
      .agg(Sketches.kmvAgg(TextOps.shingleHashes(col("text")), 64).as("mins"))
    val merged = fine.groupBy(col("grp"))
      .agg(Sketches.kmvAgg(col("mins"), 64).as("mins"))
    val plan = planOf(merged)
    val exchanges = plan.linesIterator.zipWithIndex
      .filter(_._1.contains("Exchange hashpartitioning")).map(_._2).toList
    assert(exchanges.size == 2, s"expected the two roll-up exchanges:\n$plan")
    val partials = plan.linesIterator.zipWithIndex
      .filter(_._1.contains("partial_graft_kmv_distinct")).map(_._2).toList
    assert(partials.size == 2, s"both levels must partial-combine:\n$plan")
    // plan text is top-down: each exchange's partial sits BELOW it
    assert(exchanges.zip(partials).forall { case (e, p) => p > e },
      s"each partial sketch must sit below its exchange:\n$plan")
  }

  test("spanDuplication: df join is NOT hint-broadcast (span vocabulary is corpus-sized)") {
    withNoAutoBroadcast {
      import spark.implicits._
      val docs = Seq((1L, "x y z w"), (2L, "x y z q")).toDF("doc_id", "text")
      val plan = planOf(graft.llm.Dedup.spanDuplication(docs, "doc_id", "text"))
      assert(!plan.contains("BroadcastHashJoin"),
        s"span-frequency join must shuffle at scale:\n$plan")
    }
  }

  test("selectByBudget: range partition + per-pid windows, no single-partition sort") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").as("score"), col("n_chars"))
    val plan = planOf(graft.llm.Selection.selectByBudget(
      docs, "doc_id", "score", col("n_chars"), budgetTokens = 100000L))
    // the range exchange runs inside the localCheckpoint barrier (it
    // must: the offsets collect and the final pass need the SAME
    // partitioning) and surfaces as the ExistingRDD scan
    assert(plan.contains("Scan ExistingRDD"),
      s"the sorted partitioning must be materialized once:\n$plan")
    // the cumsum window must partition by pid — a global-order window
    // with no PARTITION BY serializes the corpus through one task
    assert(!plan.matches("(?s).*Window \\[[^\\]]*windowspecdefinition\\(score.*"),
      s"no window may order globally without a pid partition:\n$plan")
    assert(plan.contains("windowspecdefinition(_pid"),
      s"the cumsum window must partition by pid:\n$plan")
  }

  test("rangeJoin: hash equi-join on (key, bucket) — never nested-loop/cartesian") {
    withNoAutoBroadcast {
      import spark.implicits._
      val pts = Seq(("k", 5L, 1L), ("k", 99L, 2L)).toDF("key", "ord", "pid")
      val ivs = Seq(("k", 0L, 10L, 1L)).toDF("key", "s", "e", "iid")
      val plan = planOf(graft.operators.Joins.rangeJoin(pts, ivs, "key", "ord", "s", "e", 16L))
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"range predicate must ride a bucket equi-join, not a loop join:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a keyed hash/merge join:\n$plan")
    }
  }

  test("intervalJoin: two-sided overlap rides a (key, bucket) equi-join") {
    withNoAutoBroadcast {
      import spark.implicits._
      val lhs = Seq(("k", 0L, 30L, 1L)).toDF("key", "ls", "le", "lid")
      val rhs = Seq(("k", 20L, 90L, 1L)).toDF("key", "rs", "re", "rid")
      val plan = planOf(
        graft.operators.Joins.intervalJoin(lhs, rhs, "key", "ls", "le", "rs", "re", 16L))
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"overlap predicate must ride a bucket equi-join, not a loop join:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a keyed hash/merge join:\n$plan")
    }
  }

  test("qualityRules: bigram aggregate partial-combines below the exchange") {
    val plan = planOf(graft.llm.TextAnalysis.qualityRules(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text"))
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("partial_count")
    assert(exIdx >= 0 && partialIdx > exIdx,
      s"per-(doc,bigram) counts must combine map-side before the shuffle:\n$plan")
  }

  test("Profile.profile: every column profiles in ONE scan of the table") {
    val plan = planOf(graft.operators.Profile.profile(
      spark.read.parquet(s"$dir/documents.parquet"),
      Seq("doc_id", "lang", "source")))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected a single table scan, found $scans:\n$plan")
  }

  test("Funnel.ordered: the events relation is scanned once, behind the checkpoint") {
    // VERDICT r6 item 1: each step's filter used to re-plan a fresh
    // scan of the source (N+1 scans for an N-step funnel). The narrow
    // (key, ord, type) projection now materializes once; the final plan
    // must contain ZERO direct parquet scans — every slice reads the
    // checkpointed frame.
    import org.apache.spark.sql.functions._
    val plan = planOf(graft.operators.Funnel.ordered(
      Tables.events(spark, dir), "user_id", col("event_id"), col("event_type"),
      Seq("view", "click", "purchase")))
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 0, s"expected all stages to read the one checkpointed scan, found $scans:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed (key, ord, type) frame in the plan:\n$plan")
  }

  test("lineDedup: the document-frequency aggregate partial-combines") {
    val plan = planOf(graft.llm.Dedup.lineDedup(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", 4))
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    assert(exIdx >= 0 && plan.indexOf("partial_count", exIdx) > exIdx,
      s"line doc-frequency must combine map-side below its exchange:\n$plan")
  }

  test("removeDupSpans: span frequency partial-combines; covered positions int-only") {
    val plan = planOf(graft.llm.Dedup.removeDupSpans(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
      w = 3, minRunWords = 1))
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    assert(exIdx >= 0 && plan.indexOf("partial_count", exIdx) > exIdx,
      s"the span-frequency aggregate must combine map-side below its exchange:\n$plan")
    // the covered-position dedup exchanges (doc, cp) pairs — ints only,
    // never text; the one text-bearing shuffle is the word anti-join
    val covLine = plan.linesIterator
      .find(l => l.contains("Exchange hashpartitioning") && l.contains("cp#"))
    assert(covLine.isDefined, s"expected a covered-position exchange:\n$plan")
    assert(!covLine.get.contains("wd#") && !covLine.get.contains("text#"),
      s"the covered-position exchange must carry ints only:\n${covLine.get}")
  }

  test("unimaxAllocation: no nested-loop/cartesian anywhere in the visible plan") {
    // VERDICT r6 item 5: the saturation prefix used to ride an
    // O(slices²) non-equi triangle join, and the θ/slice-count totals
    // rode single-row crossJoins (BroadcastNestedLoopJoin) — the
    // prefix now runs GlobalOrder's two-pass machinery and θ collapses
    // to a driver literal, so no nested-loop survives.
    import org.apache.spark.sql.functions._
    val plan = planOf(graft.llm.Mixture.unimaxAllocation(
      spark.read.parquet(s"$dir/documents.parquet"), "source",
      size(graft.llm.TextOps.words(col("text"))), budgetTokens = 26000L, maxEpochs = 1))
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"the allocation must not plan any nested-loop/cartesian join:\n$plan")
  }

  test("temperatureWeights / sourceDivergence: scalar totals as literals, no nested loops") {
    // VERDICT r9 item 8: both operators rode a
    // crossJoin(broadcast(oneRowAgg)) — harmless 1-row BNLJs, now
    // unified on the collect-as-literal convention (Association.rules,
    // pageRank dangling mass)
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val tw = planOf(graft.llm.Mixture.temperatureWeights(
      docs, "source", size(graft.llm.TextOps.words(col("text"))), budgetTokens = 26000L))
    assert(!tw.contains("NestedLoopJoin") && !tw.contains("CartesianProduct"),
      s"temperatureWeights must not plan a nested loop:\n$tw")
    val sd = planOf(graft.llm.Mixture.sourceDivergence(docs, "source", "text"))
    assert(!sd.contains("NestedLoopJoin") && !sd.contains("CartesianProduct"),
      s"sourceDivergence must not plan a nested loop:\n$sd")
  }

  test("GlobalOrder.withPrefix: broadcast offsets, pid-partitioned window, no global sort") {
    // the shared two-pass prefix seam (selectByBudget / shardBalanced /
    // unimaxAllocation): offsets join as a BROADCAST at any partition
    // count, the running window partitions by pid (never a
    // single-partition global window), and the range sort materializes
    // once behind the checkpoint
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars").cast("long").as("t"))
    val pf = graft.core.GlobalOrder.withPrefix(
      base, Seq(col("t").desc, col("doc_id").asc), col("t"), "cum", "rk")
    assert(pf.totalRows == base.count())
    val plan = planOf(pf.df)
    assert(plan.contains("BroadcastHashJoin"),
      s"the partition-offsets join must broadcast:\n$plan")
    assert(plan.contains("windowspecdefinition(_pid"),
      s"the running window must partition by pid:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"the sorted partitioning must be materialized once:\n$plan")
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("StatTests: drift tests keep their scale shapes — no BNLJ, map-side combine, local grids") {
    import org.apache.spark.sql.functions._
    val e = Tables.events(spark, dir)
      .select(round(col("value") * 100).cast("long").as("v"),
        (col("event_type") === "purchase").as("a"),
        col("event_id"), col("event_type"), col("user_id"))
    // KS / W1: the cumulative window partitions by pid (the GlobalOrder
    // pin covers the hidden pre-checkpoint aggregate), the closing
    // reduce partial-combines before its single-partition exchange, and
    // the whole pipeline is equi-join only
    for (df <- Seq(
        graft.operators.StatTests.ksTest(e, "v", col("a")),
        graft.operators.StatTests.wasserstein(e, "v", col("a")))) {
      val plan = planOf(df)
      assert(plan.contains("windowspecdefinition(_pid"),
        s"cumulatives must ride the pid-partitioned window:\n$plan")
      val exIdx = plan.indexOf("Exchange SinglePartition")
      val partialIdx = plan.indexOf(if (plan.contains("partial_max")) "partial_max"
        else "partial_sum")
      assert(exIdx >= 0 && partialIdx >= 0 && partialIdx > exIdx,
        s"the closing reduce must combine map-side:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"no nested loops in the KS/W1 pipeline:\n$plan")
    }
    // bootstrap: the exploded B-way frame collapses to B partials per
    // task BEFORE the exchange — the shuffle carries B rows/task, never
    // B × corpus
    val bs = planOf(graft.operators.StatTests.bootstrapMean(e, col("event_id"), "v", b = 8))
    val bsEx = bs.indexOf("Exchange hashpartitioning")
    val bsPartial = bs.indexOf("partial_sum")
    assert(bsEx >= 0 && bsPartial > bsEx,
      s"bootstrap replicate sums must combine map-side:\n$bs")
    assert(!bs.contains("BroadcastNestedLoopJoin") && !bs.contains("CartesianProduct"))
    // chi-square: the returned frame is the densified LOCAL grid — the
    // corpus reduction ran eagerly at build; no parquet scan (and no
    // totals join) may linger in the visible plan
    val cs = planOf(graft.operators.StatTests.chiSquare(e, "a", "event_type"))
    assert(cs.contains("LocalTableScan"), s"the dense grid must be a local relation:\n$cs")
    assert(!cs.contains("Scan parquet"),
      s"the crosstab reduction must not replan into the returned frame:\n$cs")
    // per-key KS: only the map-side-combined CELL table rides the
    // exchanges — (k,v) agg finish + re-key to k — and the closing
    // per-key reduce reuses the window partitioning (no third)
    val kk = planOf(graft.operators.StatTests.ksByKey(e, "event_type", "v", col("a")))
    assert("Exchange hashpartitioning".r.findAllIn(kk).length == 2,
      s"ksByKey must shuffle the cell table exactly twice:\n$kk")
    // the DEEPEST exchange finishes the (k,v) cell aggregate — a
    // partial_sum must sit below it (the closing reduce's own partial
    // agg prints higher, exchange-free, reusing the window partitioning)
    val kkEx = kk.lastIndexOf("Exchange hashpartitioning")
    assert(kkEx >= 0 && kk.indexOf("partial_sum", kkEx) > kkEx,
      s"the cell aggregate must combine map-side:\n$kk")
    assert(!kk.contains("BroadcastNestedLoopJoin") && !kk.contains("CartesianProduct"))
    // PSI: the bin aggregate materializes once (totals were collected
    // off the checkpoint — no second scan, no one-row BNLJ)
    val ps = planOf(graft.operators.StatTests.psi(e, col("v") % 1000L, col("a")))
    assert(ps.contains("Scan ExistingRDD"),
      s"the bin aggregate must sit behind the checkpoint barrier:\n$ps")
    assert(!ps.contains("Scan parquet") && !ps.contains("BroadcastNestedLoopJoin"),
      s"PSI totals must not replan the scan:\n$ps")
    // per-key chi-square: the dense grid is a DISTRIBUTED equi-join of
    // the checkpointed row/col total tables — never a nested loop, and
    // the raw corpus never replans into the returned frame (everything
    // hangs off the checkpointed cell table)
    val ck = planOf(graft.operators.StatTests.chiSquareByKey(
      e, "event_type", "a", "user_id"))
    assert(!ck.contains("BroadcastNestedLoopJoin") && !ck.contains("CartesianProduct"),
      s"the per-key dense grid must stay an equi-join:\n$ck")
    assert(!ck.contains("Scan parquet"),
      s"chiSquareByKey must compute off the checkpointed cells:\n$ck")
    // per-key drift dashboard: four scorers over two checkpointed
    // counts tables, equi-joins only
    val pd = planOf(graft.operators.StatTests.perKeyDrift(
      e, "event_type", "v", col("a"), binWidth = 2000L))
    assert(!pd.contains("BroadcastNestedLoopJoin") && !pd.contains("CartesianProduct"),
      s"the dashboard join must stay equi-only:\n$pd")
  }

  test("dsirWeights: bucket models broadcast; per-doc sum partial-combines") {
    val plan = planOf(graft.llm.Selection.dsirWeights(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text",
      org.apache.spark.sql.functions.col("lang") === "en", numBuckets = 512))
    // the log-ratio table is B rows at ANY corpus size — it must come
    // to the corpus as a broadcast, never shuffle the corpus to it
    assert(plan.contains("BroadcastHashJoin"),
      s"the bucket log-ratio join must broadcast:\n$plan")
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("partial_sum")
    assert(exIdx >= 0 && partialIdx > exIdx,
      s"the per-doc decimal dot product must combine map-side:\n$plan")
  }

  test("IvfIndex probe: the cells scan prunes to the probed partitions") {
    import org.apache.spark.sql.functions._
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-plan").toString
    val emb = Tables.embeddings(spark, dir)
    graft.llm.IvfIndex.write(emb, "vec_id", "embedding", idx, numCentroids = 16)
    val probed = graft.llm.IvfIndex.probe(spark, idx,
      emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding", k = 5, nProbe = 2)
    // the whole point of the persisted layout: the corpus scan carries a
    // static partition filter on cell, so only probed directories are read
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cell[^\\]]*\\].*"),
      s"the cells scan must prune on the probed cell set:\n$plan")
    // and the persisted path is result-identical to the one-job operator
    val viaIndex = probed.select("qid", "rank", "nid", "cosine")
      .collect().map(_.toSeq).toSet
    val direct = graft.llm.Similarity.ivfTopK(emb, "vec_id", "embedding",
        col("vid") % 100 === 0, k = 5, numCentroids = 16, nProbe = 2)
      .select("qid", "rank", "nid", "cosine")
      .collect().map(_.toSeq).toSet
    assert(viaIndex == direct, "index probe must equal ivfTopK")
  }

  test("IvfIndex SQ8 probe: candidate scan reads only the code block, re-rank id-pruned") {
    import org.apache.spark.sql.functions._
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-sq8-plan").toString
    val emb = Tables.embeddings(spark, dir)
    graft.llm.IvfIndex.write(emb, "vec_id", "embedding", idx, numCentroids = 16,
      sq8 = true)
    // the candidate stage executes inside probe() (one control-plane
    // collect), so its plan is captured via a listener rather than the
    // returned frame
    val stagePlans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        stagePlans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val probed =
      try {
        val p = graft.llm.IvfIndex.probe(spark, idx,
          emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
          k = 5, nProbe = 2, sq8Rerank = 3)
        p.collect() // drive the final stage under the listener too
        p
      } finally {
        // listener events post asynchronously — give the bus a moment
        val deadline = System.nanoTime() + 10_000_000_000L
        while (System.nanoTime() < deadline && !stagePlans.toArray(Array.empty[String])
            .exists(_.contains("qv:array<tinyint>"))) Thread.sleep(100)
        spark.listenerManager.unregister(listener)
      }
    val plan = probed.queryExecution.executedPlan.toString
    // stage 1 must be the NARROW scan: int8 codes without the full
    // vector column — that column pruning is the 1/8-bytes IO economy
    import scala.jdk.CollectionConverters._
    assert(stagePlans.asScala.exists(_.linesIterator.exists(l =>
        l.contains("ReadSchema") && l.contains("qv:array<tinyint>") &&
          !l.contains("v:array<double>"))),
      s"expected a code-block-only candidate scan among:\n${stagePlans.asScala.mkString("\n---\n")}")
    // stage 2 (exact re-rank) reads full vectors but only for the
    // driver-planted candidate id set (vid In (...)) on pruned cells
    assert(plan.linesIterator.exists(l =>
        l.contains("ReadSchema") && l.contains("v:array<double>") &&
          !l.contains("qv:array<tinyint>")),
      s"expected a full-vector re-rank scan:\n$plan")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*In\\(vid[^\\]]*\\].*"),
      s"the re-rank scan must push the candidate id set:\n$plan")
    // no one-job twin exists at this exact shape (sq8TopK funnels over
    // the whole corpus, this funnels within probed cells), so pin the
    // quality floor instead: exact re-rank of 3k candidates must
    // recover the plain probe's in-cell top-k on most queries (the
    // oracle pins the exact result end-to-end)
    val viaSq8 = probed.select("qid", "nid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = graft.llm.IvfIndex.probe(spark, idx,
        emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
        k = 5, nProbe = 2)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = viaSq8.intersect(plain).size.toDouble / plain.size
    assert(overlap >= 0.8, s"SQ8 re-rank must recover most exact in-cell top-k, got $overlap")
  }

  test("IvfIndex lifecycle: append against the frozen quantizer, probe across roots, compact") {
    import org.apache.spark.sql.functions._
    import graft.llm.{IvfIndex, Similarity}
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-life").toString
    val emb = Tables.embeddings(spark, dir).localCheckpoint(false)
    val (oldHalf, newHalf) = (emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1))
    IvfIndex.write(oldHalf, "vec_id", "embedding", idx, numCentroids = 16)
    IvfIndex.appendEpoch(spark, idx, newHalf, "vec_id", "embedding", epoch = 1L)
    val queries = emb.filter(col("vec_id") % 100 === 0)

    // reference: the same assignment math over the union, against the
    // PERSISTED (first-half) quantizer — built from public operators
    def refProbe(): Set[Seq[Any]] = {
      val cents = spark.read.parquet(s"$idx/centroids")
      val p = emb
        .select(col("vec_id").as("vid"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", Similarity.norm(col("v")))
        .filter(col("nrm") > 0)
      val rk = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vid")).orderBy(col("ccos").desc, col("cid"))
      val assigned = p.crossJoin(broadcast(cents))
        .withColumn("ccos", Similarity.dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .withColumn("crk", org.apache.spark.sql.functions.row_number().over(rk))
        .localCheckpoint(false)
      val corpus = assigned.filter(col("crk") === 1)
        .select(col("vid"), col("v"), col("nrm"), col("cid").as("cell"))
      val qs = assigned.filter(col("crk") <= 2).filter(col("vid") % 100 === 0)
        .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qn"), col("cid").as("cell"))
      val scored = corpus.as("n")
        .join(broadcast(qs), col("n.cell") === qs("cell") && col("qid") =!= col("n.vid"))
        .select(col("qid"), col("n.vid").as("nid"),
          (Similarity.dot(col("qv"), col("n.v")) / (col("qn") * col("n.nrm"))).as("cosine"))
      val rn = org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(col("cosine").desc, col("nid")))
      scored.withColumn("rank", rn).filter(col("rank") <= 5)
        .select("qid", "rank", "nid", "cosine").collect().map(_.toSeq).toSet
    }
    val expected = refProbe()
    def probed(): Set[Seq[Any]] =
      IvfIndex.probe(spark, idx, queries, "vec_id", "embedding", k = 5, nProbe = 2)
        .select("qid", "rank", "nid", "cosine").collect().map(_.toSeq).toSet
    assert(probed() == expected, "probe across base + epoch roots must equal the reference")
    // epoch replay (restart before offset commit) overwrites its own root
    IvfIndex.appendEpoch(spark, idx, newHalf, "vec_id", "embedding", epoch = 1L)
    assert(probed() == expected, "epoch replay must be idempotent")
    // the health report sees exactly the two roots with the full corpus
    val desc = IvfIndex.describe(spark, idx).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(desc.keySet == Set("cells", "cells-b1"), s"got ${desc.keySet}")
    assert(desc.values.sum == emb.count(), "root counts must partition the corpus")
    // the maintenance hook is a no-op under threshold (base + 1 epoch),
    // folds once over it — the self-maintaining-ingest contract
    assert(IvfIndex.compactIfNeeded(spark, idx, maxRoots = 2) == 0,
      "2 roots at maxRoots=2 is under threshold")
    assert(IvfIndex.compactIfNeeded(spark, idx, maxRoots = 1) == 1)
    val roots = new java.io.File(idx).listFiles().map(_.getName).toSet
    assert(!roots.exists(_.startsWith("cells-b")) && roots.contains("cells"), s"got $roots")
    assert(probed() == expected, "compaction must preserve probe results")
    assert(IvfIndex.compactEpochs(spark, idx) == 0, "second compaction is a no-op")
  }

  test("IvfIndex PQ probe: candidate scan reads only the m-byte codes; lifecycle holds") {
    import org.apache.spark.sql.functions._
    import graft.llm.IvfIndex
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-pq-plan").toString
    val emb = Tables.embeddings(spark, dir).localCheckpoint(false)
    val (oldHalf, newHalf) = (emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1))
    IvfIndex.write(oldHalf, "vec_id", "embedding", idx, numCentroids = 16, pqM = 8)
    // the frozen codebook persists next to the quantizer
    assert(spark.read.parquet(s"$idx/pqbook").count() == 8 * 16)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val stagePlans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        stagePlans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val before =
      try {
        val p = IvfIndex.probe(spark, idx, queries, "vec_id", "embedding",
          k = 5, nProbe = 2, pqRerank = 3)
        val rows = p.select("qid", "rank", "nid", "cosine").collect().map(_.toSeq).toSet
        val deadline = System.nanoTime() + 10_000_000_000L
        while (System.nanoTime() < deadline && !stagePlans.toArray(Array.empty[String])
            .exists(_.contains("pqc:array<tinyint>"))) Thread.sleep(100)
        rows
      } finally spark.listenerManager.unregister(listener)
    // the ADC stage scans the 8-byte code column, never the vectors
    import scala.jdk.CollectionConverters._
    assert(stagePlans.asScala.exists(_.linesIterator.exists(l =>
        l.contains("ReadSchema") && l.contains("pqc:array<tinyint>") &&
          !l.contains("v:array<double>"))),
      s"expected a code-only ADC scan among:\n${stagePlans.asScala.mkString("\n---\n")}")
    // appends encode against the persisted frozen book; compaction
    // preserves the code column and the probe answer
    IvfIndex.appendEpoch(spark, idx, newHalf, "vec_id", "embedding", epoch = 1L)
    assert(spark.read.parquet(s"$idx/cells-b1").schema.fieldNames.contains("pqc"))
    val withEpoch = IvfIndex.probe(spark, idx, queries, "vec_id", "embedding",
        k = 5, nProbe = 2, pqRerank = 3)
      .select("qid", "rank", "nid", "cosine").collect().map(_.toSeq).toSet
    assert(withEpoch.nonEmpty && withEpoch != before,
      "the appended half must change the candidate pool")
    assert(IvfIndex.compactEpochs(spark, idx) == 1)
    assert(spark.read.parquet(s"$idx/cells").schema.fieldNames.contains("pqc"))
    val afterCompact = IvfIndex.probe(spark, idx, queries, "vec_id", "embedding",
        k = 5, nProbe = 2, pqRerank = 3)
      .select("qid", "rank", "nid", "cosine").collect().map(_.toSeq).toSet
    assert(afterCompact == withEpoch, "compaction must preserve PQ probe results")
  }

  test("IvfIndex SQ8 lifecycle: appends inherit the code block, compaction preserves it") {
    import org.apache.spark.sql.functions._
    import graft.llm.IvfIndex
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-sq8-life").toString
    val emb = Tables.embeddings(spark, dir).localCheckpoint(false)
    val (oldHalf, newHalf) = (emb.filter(col("vec_id") % 2 === 0), emb.filter(col("vec_id") % 2 === 1))
    IvfIndex.write(oldHalf, "vec_id", "embedding", idx, numCentroids = 16, sq8 = true)
    // an epoch append against an SQ8 index must quantize itself — the
    // epoch root carries the same storage shape as the base
    IvfIndex.appendEpoch(spark, idx, newHalf, "vec_id", "embedding", epoch = 1L)
    assert(spark.read.parquet(s"$idx/cells-b1").schema.fieldNames.contains("qv"),
      "the epoch root must inherit the SQ8 code block")
    val queries = emb.filter(col("vec_id") % 100 === 0)
    def probed(): Set[Seq[Any]] =
      IvfIndex.probe(spark, idx, queries, "vec_id", "embedding",
          k = 5, nProbe = 2, sq8Rerank = 3)
        .select("qid", "rank", "nid", "cosine").collect().map(_.toSeq).toSet
    val before = probed()
    assert(before.nonEmpty)
    // compaction folds the epoch without losing the code columns, and
    // the SQ8 probe answers identically
    assert(IvfIndex.compactEpochs(spark, idx) == 1)
    assert(spark.read.parquet(s"$idx/cells").schema.fieldNames.contains("qv"),
      "compaction must preserve the SQ8 code block")
    assert(probed() == before, "compaction must preserve SQ8 probe results")
  }

  test("IvfIndex compaction crash recovery: a committed stage finishes without loss") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.llm.IvfIndex
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-crash").toString
    def mk(ids: Seq[Long]) =
      ids.map(i => (i, Seq.tabulate(4)(j => (i % 7 + j + 1).toDouble))).toDF("vec_id", "embedding")
    IvfIndex.write(mk(1L to 20L), "vec_id", "embedding", idx, numCentroids = 4)
    IvfIndex.appendEpoch(spark, idx, mk(21L to 30L), "vec_id", "embedding", epoch = 1L)
    val queries = mk(Seq(5L))
    def probed(): Set[Seq[Any]] =
      IvfIndex.probe(spark, idx, queries, "vec_id", "embedding", k = 3, nProbe = 2)
        .select("qid", "rank", "nid", "cosine").collect().map(_.toSeq).toSet
    val expected = probed()

    // stage the fold exactly as compactEpochs would and COMMIT it (the
    // manifest is the commit record), then crash in the worst window:
    // both source roots already deleted, stage not yet renamed
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.types.StructField("nrm", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.LongType)))
    Seq(s"$idx/cells", s"$idx/cells-b1")
      .map(r => spark.read.schema(schema).parquet(r))
      .reduce(_ unionAll _)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$idx/.compact-cells")
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = fs.create(new org.apache.hadoop.fs.Path(s"$idx/.compact-cells/.folded-roots"), true)
    mf.write("cells\ncells-b1".getBytes("UTF-8")); mf.close()
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/cells"), true)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/cells-b1"), true)

    // the probe path self-heals from the committed stage
    assert(probed() == expected, "recovered index must serve the identical results")
    val roots = new java.io.File(idx).listFiles().map(_.getName).toSet
    assert(roots.contains("cells") && !roots.exists(_.startsWith(".compact")) &&
      !roots.exists(_.startsWith("cells-b")), s"got $roots")

    // crash window AFTER the rename, BEFORE the manifest delete: the
    // live cells/ still carries the .folded-roots dot-file — readers
    // ignore it, and the next finish pass removes it
    val mf2 = fs.create(new org.apache.hadoop.fs.Path(s"$idx/cells/.folded-roots"), true)
    mf2.write("cells\ncells-b1".getBytes("UTF-8")); mf2.close()
    assert(probed() == expected, "a stale in-place manifest must not change results")
    assert(!new java.io.File(s"$idx/cells/.folded-roots").exists(),
      "the probe's finish pass must clear the stale manifest")

    // an UNCOMMITTED stage (no manifest) is left alone by the READ path
    // (it may be an in-flight compaction's stage) ...
    val junk = new java.io.File(s"$idx/.compact-cells"); junk.mkdirs()
    assert(probed() == expected, "probe must serve from the originals")
    assert(new java.io.File(s"$idx/.compact-cells").exists(),
      "the read path must never delete a manifest-less stage out from under a writer")
    // ... and discarded only by the compaction WRITER, originals intact
    assert(IvfIndex.compactEpochs(spark, idx) == 0)
    assert(probed() == expected)
    assert(!new java.io.File(s"$idx/.compact-cells").exists())
  }

  test("IvfIndex crash recovery is re-runnable from every committed intermediate state") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.llm.IvfIndex
    val idx = java.nio.file.Files.createTempDirectory("graft-ivf-crash2").toString
    def mk(ids: Seq[Long]) =
      ids.map(i => (i, Seq.tabulate(4)(j => (i % 5 + j + 1).toDouble))).toDF("vec_id", "embedding")
    IvfIndex.write(mk(1L to 20L), "vec_id", "embedding", idx, numCentroids = 4)
    IvfIndex.appendEpoch(spark, idx, mk(21L to 30L), "vec_id", "embedding", epoch = 1L)
    val queries = mk(Seq(7L))
    def probed(): Set[Seq[Any]] =
      IvfIndex.probe(spark, idx, queries, "vec_id", "embedding", k = 3, nProbe = 2)
        .select("qid", "rank", "nid", "cosine").collect().map(_.toSeq).toSet
    val expected = probed()

    // commit a stage, then crash with the folded roots ONLY PARTIALLY
    // deleted (cells gone, the epoch root still present): the manifest
    // must still drive recovery to completion — under the old protocol
    // a crash after the manifest delete left this state unrecoverable
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vid", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.types.StructField("nrm", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.LongType)))
    Seq(s"$idx/cells", s"$idx/cells-b1")
      .map(r => spark.read.schema(schema).parquet(r))
      .reduce(_ unionAll _)
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$idx/.compact-cells")
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mf = fs.create(new org.apache.hadoop.fs.Path(s"$idx/.compact-cells/.folded-roots"), true)
    mf.write("cells\ncells-b1".getBytes("UTF-8")); mf.close()
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/cells"), true)
    // cells-b1 deliberately left behind — the partial-delete crash

    assert(probed() == expected, "recovery must finish the fold from the manifest")
    val roots = new java.io.File(idx).listFiles().map(_.getName).toSet
    assert(roots.contains("cells") && !roots.exists(_.startsWith("cells-b")) &&
      !roots.exists(_.startsWith(".compact")), s"got $roots")
    assert(!new java.io.File(s"$idx/cells/.folded-roots").exists(),
      "the manifest must be removed after the rename")
  }

  test("langConfusion: the prediction is inlined — zero joins, one scan") {
    val plan = planOf(graft.llm.TextAnalysis.langConfusion(
      spark.read.parquet(s"$dir/documents.parquet"), "doc_id", "text", "lang"))
    assert(!plan.contains("Join"),
      s"pred_lang is a per-row expression — a corpus self-join is an avoidable shuffle:\n$plan")
    assert(plan.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"the corpus must be scanned exactly once:\n$plan")
  }

  test("exact dedup: the shuffle carries hashes, never document text") {
    import spark.implicits._
    val docs = Seq((1L, "a a"), (2L, "a a"), (3L, "b")).toDF("doc_id", "text")
    val plan = planOf(graft.llm.Dedup.exact(docs, "doc_id", "text"))
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchanges.nonEmpty, s"expected a hash exchange:\n$plan")
    exchanges.foreach { line =>
      assert(!line.matches(""".*[(, ]text#\d.*"""),
        s"the dedup exchange must key on (strhash, md5), not carry corpus text:\n$line")
    }
    // partial combine below the exchange keeps shuffle volume O(distinct docs)
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("partial_min")
    assert(partialIdx > exIdx && exIdx >= 0,
      s"map-side partial aggregate must sit below the exchange:\n$plan")
  }

  test("rougeN: overlap exchanges carry gram hashes, never gram text") {
    import spark.implicits._
    val pairs = Seq((1L, "a b c", "a b c d"), (2L, "x y", "y z")).toDF("id", "cand", "ref")
    val plan = planOf(graft.llm.TextAnalysis.rougeN(pairs, "id", "cand", "ref", n = 2))
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchanges.nonEmpty, s"expected hash exchanges in the overlap join:\n$plan")
    exchanges.foreach { line =>
      assert(!line.matches(""".*[(, ]gram#\d.*"""),
        s"the overlap exchange must key on (strhash, length), not gram text:\n$line")
    }
    // grams hash map-side and counts partial-combine below the exchange:
    // shuffle rows are fixed-width (id, gh, gl, cnt) longs
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val partialIdx = plan.indexOf("partial_count")
    assert(partialIdx > exIdx && exIdx >= 0,
      s"map-side partial count must sit below the exchange:\n$plan")
  }

  test("bloomGate: the probe filter sits below the confirm join; exchanges text-free") {
    val docs = Tables.documents(spark, dir)
    val acc = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 3 =!= 0)
    val bloom = graft.llm.Dedup.corpusBloom(acc, "text", 1 << 14)
    val plan = planOf(graft.llm.Dedup.bloomGate(docs, acc, "doc_id", "text", bloom))
    // the definitely-new branch resolves in the scan itself (a negated
    // probe filter — NULL-coalesced to false since round 7, so NULL
    // text resolves definitely-new instead of vanishing — no join
    // above it) ...
    assert(plan.contains("NOT coalesce(graft_bloom_contains"),
      s"bloom-negative docs must resolve scan-side:\n$plan")
    // ... and the confirm join's probe side carries the positive filter
    // BELOW the join (plan text after the join line), so only
    // bloom-positive docs ever enter it
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && plan.indexOf("graft_bloom_contains", joinIdx) > joinIdx,
      s"bloom probe must prune the join input, not post-filter it:\n$plan")
    // and the confirm join's exchanges carry (h, md5) keys, never text
    plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).foreach { line =>
      assert(!line.matches(""".*[(, ]text#\d.*"""),
        s"the gate exchange must be text-free:\n$line")
    }
  }

  test("bloom-pruned handoff: probe filter sits below the band candidate join") {
    val docs = Tables.documents(spark, dir)
    val newSigs = graft.llm.Dedup.signatures(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 1), "doc_id", "text")
    val oldSigs = graft.llm.Dedup.signatures(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 2 === 0), "doc_id", "text")
    val bloom = graft.llm.Dedup.sigBandBloom(oldSigs, 1 << 14)
    val plan = planOf(
      graft.llm.Dedup.minhashAgainstSigs(newSigs, oldSigs, 0.6, Some(bloom)))
    // tree text prints root-first, so "below the join" = after it in
    // text: the probe filter must appear under the topmost join, never
    // as a post-filter above every join
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && plan.indexOf("graft_bloom_contains", joinIdx) > joinIdx,
      s"the probe filter must prune a join input:\n$plan")
  }

  test("semanticDedup: survivor anti-join is NOT hint-broadcast") {
    withNoAutoBroadcast {
      val plan = planOf(graft.llm.Similarity.semanticDedup(
        Tables.embeddings(spark, dir), "vec_id", "embedding", 0.4, 8))
      // the centroid broadcast is the one legitimate hint (constant-size);
      // the dropped-id anti-join must not carry one
      assert(!plan.matches("(?s).*Broadcast\\w*Join[^\\n]*LeftAnti.*"),
        s"semantic dups are O(corpus) — anti-join must shuffle:\n$plan")
      assert(plan.contains("LeftAnti"), s"anti-join must survive:\n$plan")
    }
  }

  test("fuzzyJoin: hash-keyed candidate join, variant text never in the vh exchange") {
    withNoAutoBroadcast {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val df = Seq((1L, "alpha"), (2L, "alphb"), (3L, "gamma")).toDF("id", "title")
      val plan = planOf(graft.operators.Joins.fuzzySelfPairs(df, "id", "title"))
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"deletion-neighborhood blocking must ride an equi-join:\n$plan")
      // the variant-keyed exchanges carry (id, vh) only — title text
      // re-attaches AFTER the candidate distinct
      val vhLines = plan.linesIterator.filter(_.contains("hashpartitioning(vh")).toList
      assert(vhLines.nonEmpty, s"expected vh-keyed exchanges:\n$plan")
      assert(vhLines.forall(!_.contains("title")),
        s"variant exchange must not carry the string column:\n$vhLines")
    }
  }

  test("joinCardinality: the two tables NEVER co-shuffle — no keyed join at all") {
    withNoAutoBroadcast {
      import org.apache.spark.sql.functions._
      val plan = planOf(graft.llm.Sketches.joinCardinality(
        Tables.orders(spark, dir), col("o_orderkey"),
        Tables.lineitem(spark, dir), col("l_orderkey"), k = 16))
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"the estimate must come from sketches, not a join of the tables:\n$plan")
      // the only join is the 1x1 stitch of two single-row aggregates
      // (a CartesianProduct of single rows with broadcast disabled)
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"),
        s"expected exactly the single-row crossJoin:\n$plan")
      // each side folds its sketch map-side before the single-partition
      // exchange — the wire carries <= k longs per task
      assert(plan.contains("partial_graft_kmv_distinct"),
        s"sketch must partial-combine below the exchange:\n$plan")
    }
  }

  test("trainingOrder: per-slice windows partition by the slice, step rides GlobalOrder") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val plan = planOf(graft.llm.Mixture.trainingOrder(docs, "doc_id", "source",
      col("n_chars")))
    // every window must carry a partition spec — a partitionless window
    // serializes the corpus through one task (and Catalyst strips
    // foldable partition keys, so there is no cheating it)
    assert(!plan.matches("(?s).*windowspecdefinition\\((pos|_j).*"),
      s"the global step must come from GlobalOrder, not a global window:\n$plan")
    assert(plan.contains("windowspecdefinition(source") ||
      plan.contains("windowspecdefinition(_pid"),
      s"expected slice- and pid-partitioned windows:\n$plan")
  }

  test("associationRules / triangleCount: quadratics stay inside equi-joins") {
    // both pair stages join on the transaction/apex KEY with the
    // ordering predicate as a post-join filter — the self-join must
    // plan as a hash/sort-merge equi-join, never a nested loop over
    // the corpus
    import org.apache.spark.sql.functions._
    val basket = planOf(graft.operators.Association.rules(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", minSupport = 2L, k = 10))
    assert(!basket.contains("NestedLoopJoin") && !basket.contains("CartesianProduct"),
      s"basket pairs must ride the txn equi-join:\n$basket")
    val tri = planOf(graft.operators.Graph.triangleCount(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst")),
      "src", "dst"))
    assert(!tri.contains("NestedLoopJoin") && !tri.contains("CartesianProduct"),
      s"wedge and closing joins must be equi-joins:\n$tri")
    // winnowedPairs: the fp-keyed pair join with the df cap — equi-join
    // only, no broadcast hints (both sides corpus-sized), pair counts
    // partial-combined below their exchange
    val wp = planOf(graft.llm.Dedup.winnowedPairs(
      Tables.documents(spark, dir), "doc_id", "text"))
    assert(!wp.contains("NestedLoopJoin") && !wp.contains("CartesianProduct"),
      s"winnow pairs must ride the fp equi-join:\n$wp")
    assert(wp.contains("partial_count"),
      s"pair counts must partial-combine below the exchange:\n$wp")
  }

  test("trainingSet: N features ride ONE window pass — no join, one window exec") {
    import spark.implicits._
    val spine = Seq(("a", 5L, 1.0)).toDF("key", "ord", "label")
    val f1 = Seq(("a", 1L, 1.0)).toDF("key", "ord", "v")
    val f2 = Seq(("a", 2L, 2.0)).toDF("key", "ord", "v")
    val df = graft.operators.Joins.trainingSet(spine, "key", "ord", Seq(
      graft.operators.Joins.FeatureTimeline(f1, "ord", "v", "fa"),
      graft.operators.Joins.FeatureTimeline(f2, "ord", "v", "fb")))
    df.collect()
    // AQE's toString prints the Final AND Initial plans — pin the final
    val plan = planOf(df).split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"trainingSet must plan no join operator:\n$plan")
    val windowLines = plan.split("\n").filter(_.contains("Window ["))
    assert(windowLines.length == 1,
      s"all feature frames must share ONE WindowExec:\n$plan")
    assert(windowLines.head.contains("fa") && windowLines.head.contains("fb"),
      s"both features must be expressions of the one window:\n${windowLines.head}")
  }

  test("Upsert.history: both windows share ONE exchange and ONE sort") {
    import spark.implicits._
    val log = Seq(("a", 1L, "x"), ("a", 2L, "y")).toDF("key", "ord", "v")
    val df = graft.operators.Upsert.history(log, "key", "ord", Seq("v"))
    df.collect()
    val plan = planOf(df).split("== Initial Plan ==").head
    val lines = plan.split("\n")
    assert(lines.count(_.contains("Window [")) == 2,
      s"lag-change and lead-close are two window passes:\n$plan")
    assert(lines.count(_.contains("Exchange hashpartitioning")) == 1,
      s"the change filter preserves distribution — ONE shuffle only:\n$plan")
    assert(lines.count(_.contains("Sort [")) == 1,
      s"the change filter preserves ordering — ONE sort only:\n$plan")
  }

  test("Upsert.staleness: as_of join broadcasts — no global window, no BNLJ") {
    import spark.implicits._
    val log = (1 to 100).map(i => ("k" + i % 7, i.toLong)).toDF("key", "ord")
    val df = graft.operators.Upsert.staleness(log, "key", "ord")
    df.collect()
    val plan = planOf(df).split("== Initial Plan ==").head
    assert(!plan.contains("Window"),
      s"a global window would funnel all keys through one task:\n$plan")
    assert(!plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"the 1-row as_of side must ride an equi broadcast join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the broadcast hash join on the constant key:\n$plan")
  }

  test("TextIndex.probeAll: one pruned scan per root, not per query") {
    import org.apache.spark.sql.functions._
    val idx = java.nio.file.Files.createTempDirectory("graft-ti-multi-plan").toString
    val docs = Tables.documents(spark, dir).localCheckpoint(false)
    graft.llm.TextIndex.write(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", idx, nBuckets = 16)
    graft.llm.TextIndex.appendEpoch(spark, idx,
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", epoch = 1L)
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    Seq(1L -> Seq("scan", "filter"), 2L -> Seq("merge", "vector"),
        3L -> Seq("spark", "window")).foreach { case (q, ts) =>
      rows.add(org.apache.spark.sql.Row(q, ts))
    }
    import org.apache.spark.sql.types._
    val qdf = spark.createDataFrame(rows, StructType(Seq(
      StructField("qid", LongType, nullable = false),
      StructField("terms", ArrayType(StringType, containsNull = false), nullable = false))))
    val plan = planOf(graft.llm.TextIndex.probeAll(
      spark, idx, qdf, "qid", "terms", k = 5))
    // 3 queries, 2 roots: exactly 2 bucket-pruned postings scans — the
    // batch amortization the serving shape exists for
    val pruned = plan.linesIterator.count(l =>
      l.contains("FileScan parquet") && l.contains("PartitionFilters") &&
        l.contains("bucket"))
    assert(pruned == 2, s"expected 2 pruned postings scans (one per root), got $pruned:\n$plan")
    assert(plan.contains("TopKPerKey"),
      s"per-qid top-k must ride the bounded-heap operator:\n$plan")
  }

  test("count-min: tokens fold inside the aggregate — no explode below, partial combine") {
    val plan = planOf(graft.llm.Sketches.termFrequencies(
      Tables.documents(spark, dir), "source", "text",
      Seq("the", "merge"), depth = 4, width = 64))
    // the ONLY generator is the probe-term unpack above the aggregate;
    // the token stream must never explode (the buffer folds arrays in
    // place — that is the no-(group,term)-shuffle economy)
    val generates = "Generate explode".r.findAllIn(plan).length
    assert(generates == 1, s"expected exactly the probe explode, got $generates:\n$plan")
    assert(plan.contains("partial_graft_count_min"),
      s"sketch buffers must partial-combine below the exchange:\n$plan")
  }

  test("Embeddings.gram: one-pass buffer fold — no explode, no join, partial combine") {
    val plan = planOf(graft.llm.Embeddings.gram(
      Tables.embeddings(spark, dir), "vec_id", "embedding"))
    // the former plan exploded rows × d and self-joined on vid; the
    // GramSheet aggregate folds raw vectors per task — the exchange
    // carries one buffer per task, never a row per (vid, i) pair
    val generates = "Generate ".r.findAllIn(plan).length
    assert(generates == 1 && plan.contains("Generate inline"),
      s"the ONLY generator is the d²-row sheet unpack above the aggregate " +
        s"(vectors fold inside the buffer, never explode), got $generates:\n$plan")
    assert(!plan.contains("Join"),
      s"the Gram sheet needs no self-join:\n$plan")
    assert(plan.contains("partial_graft_gram"),
      s"sheet buffers must partial-combine below the exchange:\n$plan")
    val scans = "FileScan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"one corpus scan, saw $scans:\n$plan")
    assert(plan.contains("ReadSchema: struct<embedding:array<float>>"),
      s"only the vector column may be read:\n$plan")
  }

  test("pageRank: no nested-loop join in any iteration stage") {
    // the dangling-mass scalar is COLLECTED per round and re-enters as
    // a literal (the Association.rules convention) — the former
    // crossJoin(broadcast(oneRowAgg)) planned a 1-row
    // BroadcastNestedLoopJoin per iteration. The loop's stages execute
    // eagerly inside pageRank (per-round collect), so their plans are
    // captured via a listener, not the returned frame.
    import org.apache.spark.sql.functions._
    val stagePlans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        stagePlans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val edges = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
      graft.operators.Graph.pageRank(edges, "src", "dst", iters = 2).collect()
      // listener events post asynchronously: the loop runs 1 seed-count
      // + 2 dangling collects before the final action — wait for all 4
      val deadline = System.nanoTime() + 10_000_000_000L
      while (System.nanoTime() < deadline &&
          stagePlans.toArray(Array.empty[String]).length < 4) Thread.sleep(100)
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    val offenders = stagePlans.asScala.filter(p =>
      p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"))
    assert(offenders.isEmpty,
      s"pageRank iteration stages must be nested-loop-free:\n${offenders.mkString("\n---\n")}")
  }

  test("logisticTrain / connectedComponentsBigStar: eager loop stages are nested-loop-free, partial-combined") {
    // both loops run eagerly inside the operator (per-round collects),
    // so their stage plans are captured via a listener, the pageRank
    // convention
    import org.apache.spark.sql.functions._
    val stagePlans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        stagePlans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      import spark.implicits._
      val f = (0 until 64).map(i => (i.toLong, i / 63.0, i % 2)).toDF("id", "x", "y")
      graft.llm.Classify.logisticTrain(f, "y", Seq("x"), iters = 3, lr = 1.0)
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
      graft.operators.Graph.connectedComponentsBigStar(edges, "src", "dst").collect()
      val deadline = System.nanoTime() + 10_000_000_000L
      while (System.nanoTime() < deadline &&
          stagePlans.toArray(Array.empty[String]).length < 5) Thread.sleep(100)
    } finally spark.listenerManager.unregister(listener)
    import scala.jdk.CollectionConverters._
    val plans = stagePlans.asScala.toList
    assert(plans.nonEmpty, "listener must capture the eager loop stages")
    val offenders = plans.filter(p =>
      p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"))
    assert(offenders.isEmpty,
      s"loop stages must be nested-loop-free:\n${offenders.mkString("\n---\n")}")
    // the GD gradient aggregates partial-combine below their exchange:
    // shuffle rows are d+1 longs per task, not per doc
    val gradPlans = plans.filter(_.contains("partial_sum"))
    assert(gradPlans.nonEmpty, "expected map-side partial gradient sums in the loop stages")
  }

  test("entropy: totals off the shared counts barrier, never a per-column window") {
    // the (c, v) counts frame checkpoints once off ONE table scan;
    // totals and terms both read the materialized RDD. The former
    // Window.partitionBy(c) totals (partition count == cols.length,
    // rows-scaled input — one task per column, VERDICT r7) must not
    // reappear: no window at all in this plan.
    val plan = planOf(graft.operators.Profile.entropy(
      spark.read.parquet(s"$dir/events.parquet")
        .select("event_id", "user_id", "event_type"),
      Seq("event_type", "user_id", "event_id")))
    assert(!plan.contains("Window"),
      s"per-column totals must be an aggregate join, not a window:\n$plan")
    assert(!plan.contains("FileScan parquet"),
      s"the table scan must sit behind the counts checkpoint (one materialization):\n$plan")
    val rddScans = "Scan ExistingRDD".r.findAllIn(plan).length
    assert(rddScans >= 2,
      s"totals and terms must both read the shared counts barrier, saw $rddScans:\n$plan")
  }

  test("Fan.out: round-robin exchange on a single-split scan, no-op on a multi-split one") {
    // r13 verdict #7a: pin the fan condition from both sides so a
    // guard edit can't silently disable (or blanket-enable) it.
    import org.apache.spark.sql.functions._
    val par = spark.sparkContext.defaultParallelism
    val tmp = java.nio.file.Files.createTempDirectory("graft-fan-pin").toString
    spark.range(5000).select(col("id"), concat(lit("doc "), col("id")).as("text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/one")
    val one = spark.read.parquet(s"$tmp/one")
    val fanned = graft.core.Fan.out(one)
    fanned.collect()
    val fp = fanned.queryExecution.executedPlan.toString
    assert(fp.contains("RoundRobinPartitioning"),
      s"single-split scan must fan to a round-robin exchange:\n$fp")
    // multi-split layout (>= defaultParallelism splits): the guard must
    // no-op — no exchange planned at all. The test files are tiny, so
    // pin the split confs (openCost would otherwise pack them all into
    // one split and the scan would legitimately fan).
    spark.range(5000).select(col("id"), concat(lit("doc "), col("id")).as("text"))
      .repartition(par * 2).write.mode("overwrite").parquet(s"$tmp/many")
    val (mpb0, oc0) = (spark.conf.get("spark.sql.files.maxPartitionBytes"),
      spark.conf.get("spark.sql.files.openCostInBytes"))
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "16384")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      val many = spark.read.parquet(s"$tmp/many")
      val kept = graft.core.Fan.out(many)
      kept.collect()
      val kp = kept.queryExecution.executedPlan.toString
      assert(!kp.contains("RoundRobinPartitioning"),
        s"multi-split scan must not fan:\n$kp")
    } finally {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb0)
      spark.conf.set("spark.sql.files.openCostInBytes", oc0)
    }
    // r13 ADVICE: a tiny driver-side constants frame (LocalRelation
    // below one row per target slice) must not pay a fan exchange
    val tiny = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L), org.apache.spark.sql.Row(2L)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
    val tinyOut = graft.core.Fan.out(tiny)
    tinyOut.collect()
    assert(!tinyOut.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning"),
      "a few-row LocalRelation must not fan")
  }

  test("pageRankResumed: ONE shared prep for both legs (one seed-count aggregate)") {
    // r13 verdict #7b: the shared-prep warm start must keep running
    // exactly one prep's worth of control-plane aggregates. The seed
    // count (sum(sf)) is collected once per prep, so the listener must
    // see exactly ONE such query for the resumed pair — the two-call
    // form runs two.
    import org.apache.spark.sql.functions._
    val e = spark.range(400).select((col("id") % 40).as("src"), (col("id") % 23).as("dst"))
    val snPlans = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        if (qe.analyzed.toString.contains("sum(sf")) snPlans.incrementAndGet()
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      graft.operators.Graph.pageRankResumed(e, "src", "dst",
        itersFirst = 2, itersResumed = 2).collect()
      // listener events post asynchronously — poll before asserting
      val deadline = System.nanoTime() + 10_000_000_000L
      while (System.nanoTime() < deadline && snPlans.get() < 1) Thread.sleep(100)
    } finally spark.listenerManager.unregister(listener)
    assert(snPlans.get() == 1,
      s"resumed pair must prep once (one seed-count aggregate), saw ${snPlans.get()}")
  }
}
