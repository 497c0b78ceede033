package graft

import org.apache.spark.sql.functions._

import graft.llm.{Sketches, TextOps}

/** KMV distinct-count sketch (graft.functions.KmvDistinct): merge
  * semantics, exactness below the fill point, and estimator accuracy
  * against ground truth.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("sketch is partition-count invariant (merge = capped insert)") {
    val one = Sketches.distinctShingles(docs.repartition(1), "source", "text", 64)
      .orderBy("grp").collect()
    val many = Sketches.distinctShingles(docs.repartition(13), "source", "text", 64)
      .orderBy("grp").collect()
    assert(one.toSeq == many.toSeq)
  }

  test("below k the sketch IS the exact distinct set") {
    val tiny = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "f g h i j"))
      .toDF("doc_id", "text")
    val out = Sketches.distinctShingles(tiny, "doc_id", "text", 256)
      .orderBy("grp").collect()
    // 5 words -> 3 shingles per doc; below k=256 est_distinct must equal
    // n_mins exactly and kth_min must be the -1 sentinel
    out.foreach { r =>
      assert(r.getAs[Long]("n_mins") === 3L)
      assert(r.getAs[Long]("kth_min") === -1L)
      assert(r.getAs[Double]("est_distinct") === 3.0)
    }
  }

  test("null array elements are skipped, not folded in as 0 (ADVICE r4)") {
    import graft.functions.GraftFunctions
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    s2.range(1).createOrReplaceTempView("one")
    // with a null slot: the sketch must see {5, 9}, never a phantom 0
    val withNull = s2.sql(
      "SELECT graft_kmv_distinct(array(5L, CAST(NULL AS BIGINT), 9L), 4) AS s FROM one")
      .collect()(0).getSeq[Long](0)
    val without = s2.sql(
      "SELECT graft_kmv_distinct(array(5L, 9L), 4) AS s FROM one")
      .collect()(0).getSeq[Long](0)
    assert(withNull == without,
      s"null element changed the sketch: $withNull vs $without")
  }

  test("estimator lands within KMV error bounds of the exact count") {
    val k = 256
    val est = Sketches.distinctShingles(docs, "source", "text", k)
      .select(col("grp"), col("est_distinct"))
    val exact = docs
      .select(col("source").as("grp"), explode(TextOps.shingleHashes(col("text"))).as("x"))
      .groupBy("grp").agg(countDistinct(col("x")).as("n_exact"))
    val joined = est.join(exact, "grp").collect()
    assert(joined.nonEmpty)
    // standard error ~= 1/sqrt(k-2) ~= 6.3%; allow 4 sigma
    joined.foreach { r =>
      val e = r.getAs[Double]("est_distinct")
      val x = r.getAs[Long]("n_exact").toDouble
      assert(math.abs(e - x) / x < 0.25,
        s"${r.getAs[String]("grp")}: est $e vs exact $x")
    }
  }

  test("heavy hitters: exact below capacity, partition-count invariant") {
    val one = Sketches.topTermsSketch(docs.repartition(1), "source", "text", 256, 5)
      .orderBy("grp", "rank").collect().toSeq
    val many = Sketches.topTermsSketch(docs.repartition(13), "source", "text", 256, 5)
      .orderBy("grp", "rank").collect().toSeq
    assert(one == many, "sketch must not depend on partitioning below capacity")
    // exact: equals the full groupBy count top-5
    val exact = docs
      .select(col("source").as("grp"), explode(TextOps.words(col("text"))).as("w"))
      .groupBy("grp", "w").count()
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
          .orderBy(col("count").desc, col("w"))))
      .filter(col("rank") <= 5)
      .select(col("grp"), col("rank").cast("long"), col("w"), col("count"))
      .orderBy("grp", "rank").collect().toSeq
    assert(one == exact, "below capacity the sketch IS the exact count map")
  }

  test("heavy hitters: MG guarantees hold in the approximate regime") {
    import graft.functions.HeavyHitters
    import org.apache.spark.sql.graft.Bridge
    // skewed stream: 'hot' 400x, 'warm' 120x, 60 singletons; k=4 counters
    val words = (Seq.fill(400)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 60).map(i => s"cold$i"))
    val n = words.size
    val k = 4
    val docsDf = new scala.util.Random(3).shuffle(words).grouped(10).toSeq
      .map(g => Tuple1(g.mkString(" "))).toDF("text")
    val hh = docsDf.repartition(7)
      .agg(Bridge.column(HeavyHitters(
        Bridge.expression(split(col("text"), " ")), k).toAggregateExpression()).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every term with true count > n/(k+1) = 116 must be present
    assert(hh.contains("hot") && hh.contains("warm"), s"got $hh")
    // estimates never exceed true counts, undercount bounded by n/(k+1)
    assert(hh("hot") <= 400 && hh("hot") >= 400 - n / (k + 1), s"hot=${hh("hot")}")
    assert(hh("warm") <= 120 && hh("warm") >= 120 - n / (k + 1), s"warm=${hh("warm")}")
    assert(hh.size <= k)
  }

  test("quantile sketch: exact below k, partition-invariant, accurate above k") {
    // below k the sample is the whole group: p50 == the true median
    val one = Sketches.quantiles(docs.repartition(1), "source", "doc_id", col("n_chars"), 64, Seq(0.5, 0.9))
      .orderBy("grp").collect().toSeq
    val many = Sketches.quantiles(docs.repartition(13), "source", "doc_id", col("n_chars"), 64, Seq(0.5, 0.9))
      .orderBy("grp").collect().toSeq
    assert(one == many, "sample must not depend on partitioning")
    val trueMedian = docs.groupBy(col("source").as("grp"))
      .agg(expr("percentile(n_chars, 0.5)").as("med"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    one.foreach { r =>
      val (grp, n, p50) = (r.getString(0), r.getLong(1), r.getDouble(2))
      assert(n < 64, s"fixture group $grp must sit below capacity")
      // lower-nearest-rank vs interpolated median: within one doc length
      assert(math.abs(p50 - trueMedian(grp)) <= trueMedian(grp) * 0.1 + 30,
        s"$grp: p50=$p50 vs median=${trueMedian(grp)}")
    }

    // above k: a 20k-row group with known uniform values 1..20000 —
    // the sampled p50 must land near 10000 (~1/sqrt(64) error)
    import spark.implicits._
    val big = (1L to 20000L).map(i => ("g", i, i.toDouble)).toDF("grp", "id", "v")
    val est = Sketches.quantiles(big, "grp", "id", col("v"), 64, Seq(0.5))
      .collect()(0)
    assert(est.getLong(1) == 64L)
    val p50 = est.getDouble(2)
    assert(math.abs(p50 - 10000.0) < 3500.0, s"sampled p50=$p50, want ~10000")
  }

  test("bottom-k pairs roll-up == direct sample, including past capacity and key ties") {
    // 3 sub-slices of a 3000-value group, k=32: merged pair sketches
    // must equal the one-pass sample (capacity evicts, ties keep min)
    val rows = (1L to 3000L).map(i => (s"s${i % 3}", i, (i % 977).toDouble))
    val df = rows.toDF("sub", "id", "v")
    val direct = Sketches.quantiles(
        df.withColumn("g", lit("all")), "g", "id", col("v"), 32, Seq(0.5, 0.9))
      .collect().head
    val rolled = Sketches.quantileRollup(
        df.withColumn("g", lit("all")), "g", "sub", "id", col("v"), 32, Seq(0.5, 0.9))
      .orderBy("grp").collect()
    // one group: its per-group row AND the total row must both equal direct
    assert(rolled.length == 2)
    rolled.foreach { r =>
      assert(r.getLong(1) == direct.getLong(1), s"n_sample: $r vs $direct")
      assert(r.getDouble(2) == direct.getDouble(2) && r.getDouble(3) == direct.getDouble(3),
        s"quantiles must be bit-identical: $r vs $direct")
    }
    // partition-count invariance of the merged path
    val rolled13 = Sketches.quantileRollup(
        df.repartition(13).withColumn("g", lit("all")), "g", "sub", "id", col("v"), 32, Seq(0.5, 0.9))
      .orderBy("grp").collect()
    assert(rolled.map(_.toSeq).toSeq == rolled13.map(_.toSeq).toSeq)
  }

  test("MG merge aggregate: exact below capacity, bounds hold when truncating") {
    import graft.functions.{HeavyHitters, HeavyHittersMerge}
    import org.apache.spark.sql.graft.Bridge
    // exact regime: tiny vocabulary, k far above it — rolled top terms
    // equal plain counts at both levels (the oracle contract)
    val tiny = Seq(
      (1L, "sub1", "a a a b c"), (2L, "sub1", "b b a"), (3L, "sub2", "c c c c b"))
      .toDF("doc_id", "sub", "text").withColumn("g", lit("all"))
    val rolled = Sketches.topTermsRollup(tiny, "g", "sub", "text", sketchK = 16, top = 3)
      .orderBy("grp", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val expected = Seq(("all", 1L, "c", 5L), ("all", 2L, "a", 4L), ("all", 3L, "b", 4L))
    assert(rolled.toSeq == expected ++ expected.map { case (_, rk, t, c) => ("total", rk, t, c) },
      s"got ${rolled.toSeq}")

    // truncating regime: skewed sub-sketches merged at k=4 — the merge
    // aggregate must keep the MG guarantees (presence of hot terms,
    // never overcount, undercount <= n/(k+1))
    val words = Seq.fill(400)("hot") ++ Seq.fill(120)("warm") ++ (1 to 60).map(i => s"cold$i")
    val n = words.size
    val k = 4
    val docsDf = new scala.util.Random(7).shuffle(words).grouped(10).toSeq
      .zipWithIndex.map { case (g, i) => (s"sub${i % 5}", g.mkString(" ")) }
      .toDF("sub", "text")
    val fine = docsDf.groupBy(col("sub"))
      .agg(Bridge.column(HeavyHitters(
        Bridge.expression(split(col("text"), " ")), k).toAggregateExpression()).as("hh"))
    val merged = fine.repartition(3)
      .agg(Bridge.column(HeavyHittersMerge(
        Bridge.expression(col("hh")), k).toAggregateExpression()).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.contains("hot"), s"got $merged")
    assert(merged("hot") <= 400 && merged("hot") >= 400 - n / (k + 1), s"hot=${merged("hot")}")
    assert(merged.size <= k)
  }

  test("duplicate values across docs never double-fill the sketch") {
    // two docs with identical text: union of hash sets == each set
    val dup = Seq((1L, "one two three four five six"), (2L, "one two three four five six"))
      .toDF("doc_id", "text")
    val whole = Sketches.distinctShingles(dup.withColumn("g", lit("all")), "g", "text", 8)
      .collect().head
    assert(whole.getAs[Long]("n_mins") === 4L) // 6 words -> 4 shingles
  }

  test("robustOutliers: planted spike flagged, inliers quiet, MAD=0 group silent") {
    // group g: values 10..20 (med 15, MAD 3 on the full sample) + one
    // spike at 1000; group z: constant values -> MAD 0 -> no flags even
    // for a deviating row? No: constant EXCEPT one row -> MAD stays 0
    // (majority identical), group must stay silent by contract
    val g = (0 to 10).map(i => (i.toLong, "g", 10.0 + i)) :+ (99L, "g", 1000.0)
    val z = (100 to 110).map(i => (i.toLong, "z", 7.0)) :+ (199L, "z", 500.0)
    val df = (g ++ z).toDF("id", "grp", "v")
    val got = Sketches.robustOutliers(df, "grp", "id", col("v"), k = 64)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id"), r.getAs[Double]("mz")))
    assert(got.map(t => (t._1, t._2)).toSet == Set(("g", 99L)),
      s"only the g-spike may flag (z has MAD 0): ${got.toList}")
    val mz = got.head._3
    // sample is below k, so med/MAD are exact: med 15 or 15.5-adjacent
    // (lower median of 12 values = 6th = 15), MAD = lower median of
    // |x-15| sorted = 3; mz = 0.6745*(1000-15)/3
    assert(math.abs(mz - BigDecimal(0.6745 * 985 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"mz $mz")
  }

  test("skewAdvisor: hot key flagged, uniform keys pass, shares exact below capacity") {
    val rows = (Seq.fill(600)("hot") ++ (1 to 400).map(i => s"k${i % 40}"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("id", "key")
    val got = Sketches.skewAdvisor(rows, "key", sketchK = 64, top = 3)
      .orderBy("rank").collect()
    assert(got(0).getAs[String]("key") == "hot")
    assert(got(0).getAs[Long]("cnt") == 600L && got(0).getAs[Double]("share") == 0.6)
    assert(got(0).getAs[Boolean]("salt_recommended"))
    assert(!got(1).getAs[Boolean]("salt_recommended"),
      s"1% keys must not be flagged: ${got.toList}")
  }

  test("joinCardinality: overlap regimes + accuracy within sketch noise") {
    def frame(ids: Seq[Long], copies: Int) =
      ids.flatMap(i => Seq.fill(copies)(i)).toDF("key")
    // half-overlapping key sets, right side 3 rows per key
    val a = frame(1L to 4000L, 1)
    val b = frame(2001L to 6000L, 3)
    val got = Sketches.joinCardinality(a, col("key"), b, col("key"), k = 256)
      .collect().head
    val trueJoin = 2000.0 * 3 // keys 2001..4000, 3 copies each
    assert(math.abs(got.getAs[Double]("est_distinct_a") - 4000) < 4000 * 0.25)
    assert(math.abs(got.getAs[Double]("est_join_rows") - trueJoin) < trueJoin * 0.35,
      s"est ${got.getAs[Double]("est_join_rows")} vs true $trueJoin")
    // disjoint keys: jaccard and join estimates collapse to ~0
    val dj = Sketches.joinCardinality(
      frame(1L to 1000L, 1), col("key"),
      frame(100001L to 101000L, 1), col("key"), k = 256).collect().head
    assert(dj.getAs[Double]("jaccard_est") <= 0.02 &&
      dj.getAs[Double]("est_join_rows") <= 1000 * 0.05)
    // identical sides: jaccard exactly 1, estimate ~ |A| (1 copy each)
    val idt = Sketches.joinCardinality(
      frame(1L to 3000L, 1), col("key"),
      frame(1L to 3000L, 1), col("key"), k = 256).collect().head
    assert(idt.getAs[Double]("jaccard_est") == 1.0)
    assert(math.abs(idt.getAs[Double]("est_join_rows") - 3000) < 3000 * 0.25)
  }

  test("count-min: never undercounts, exact when buckets don't collide, partition-invariant") {
    val tiny = Seq(
      (1L, "g1", "a a a b"), (2L, "g1", "a b c"), (3L, "g2", "c c d"))
      .toDF("doc_id", "grp0", "text")
    val probes = Seq("a", "b", "c", "d", "zzz-absent")
    def run(df: org.apache.spark.sql.DataFrame, width: Int) =
      Sketches.termFrequencies(df, "grp0", "text", probes, depth = 4, width = width)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // wide sketch: 5-term vocabulary in 1024 buckets × 4 rows — the
    // no-collision regime, so every estimate is the exact count
    val exact = Map(
      ("g1", "a") -> 4L, ("g1", "b") -> 2L, ("g1", "c") -> 1L,
      ("g1", "d") -> 0L, ("g1", "zzz-absent") -> 0L,
      ("g2", "a") -> 0L, ("g2", "b") -> 0L, ("g2", "c") -> 2L,
      ("g2", "d") -> 1L, ("g2", "zzz-absent") -> 0L)
    assert(run(tiny, 1024) == exact, s"got ${run(tiny, 1024)}")
    // partition-count invariance: counters are a pure function of the
    // input multiset
    assert(run(tiny.repartition(7), 1024) == exact)
    // narrow sketch (forced collisions): estimates only ever OVERcount
    val narrow = run(tiny, 2)
    exact.foreach { case (k, v) =>
      assert(narrow(k) >= v, s"$k: narrow ${narrow(k)} must be >= exact $v")
    }
  }

  test("count-min roll-up: merged artifact identical to the direct sketch") {
    // counters are linear: source→corpus merge must equal the sketch
    // built straight off the whole corpus, estimate for estimate
    val probes = Seq("the", "merge", "vector", "window", "spark")
    val direct = Sketches.termFrequencies(
        docs.withColumn("all", lit("total")), "all", "text", probes,
        depth = 4, width = 128)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val rolled = Sketches.termFrequencyRollup(
        docs, "source", "doc_id", "text", probes, depth = 4, width = 128)
      .filter(col("grp") === "total")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rolled == direct, s"rolled $rolled vs direct $direct")
    // mismatched geometry fails loudly, never mis-adds
    val s64 = docs.groupBy(col("source").as("grp"))
      .agg(Sketches.cmsAgg(graft.llm.TextOps.words(col("text")), 4, 64).as("cms"))
    val s128 = docs.groupBy(col("source").as("grp"))
      .agg(Sketches.cmsAgg(graft.llm.TextOps.words(col("text")), 4, 128).as("cms"))
    val e = intercept[Exception] {
      s64.unionAll(s128).agg(Sketches.cmsMergeAgg(col("cms"))).collect()
    }
    assert(e.getMessage != null)
  }
}
