package graft

import graft.llm.Classify

/** Multinomial-NB train→score on a constructed corpus with
  * hand-computed posteriors, plus the operator's shape contracts
  * (one row per doc, token-less fallback, tie-breaking).
  *
  * Corpus: two "en" docs over {the, cat}, one "fr" doc over {le, chat}.
  * V = {the, cat, le, chat} (|V| = 4); en tokens = 4, fr tokens = 2.
  */
class ClassifySpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat", "en"),
      (2L, "the the", "en"),
      (3L, "le chat", "fr"),
      (4L, "", "en") // token-less: must fall back to the top prior
    ).toDF("doc_id", "text", "lang")
  }

  private lazy val got =
    Classify.nbTrainScore(spark, docs, "doc_id", "text", "lang")
      .collect()
      .map(r => r.getAs[Long]("doc") ->
        (r.getAs[String]("actual"), r.getAs[String]("pred"), r.getAs[Double]("score")))
      .toMap

  private def q6(x: Double): java.math.BigDecimal =
    new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)

  test("one output row per input doc, predictions recover the labels") {
    assert(got.size == 4)
    assert(got(1L)._2 == "en" && got(2L)._2 == "en" && got(3L)._2 == "fr")
  }

  test("winning score is the quantized lprior + sum(tf * llh)") {
    // doc 1 under en: lp = ln(3/4); llh(en,the) = ln((3+1)/(4+4)),
    // llh(en,cat) = ln((1+1)/(4+4)) — each rounded to 6dp pre-sum.
    val expected = q6(math.log(3.0 / 4))
      .add(q6(math.log(4.0 / 8))).add(q6(math.log(2.0 / 8)))
    assert(math.abs(got(1L)._3 - expected.doubleValue()) < 1e-9)
  }

  test("token-less doc falls back to the highest-prior class") {
    // priors: en = ln(3/4) > fr = ln(1/4)
    assert(got(4L)._2 == "en")
    assert(math.abs(got(4L)._3 - q6(math.log(3.0 / 4)).doubleValue()) < 1e-9)
  }

  test("minDf prunes the vocabulary: posteriors match the hand computation") {
    // df: the=2, cat=1, le=1, chat=1 → minDf=2 keeps V = {the} (|V|=1).
    // Kept counts: (en, the)=3; fr keeps nothing → tot(fr)=0 must still
    // smooth. llh(en,the) = ln(4/4) = 0; llh(fr,the) = ln(1/1) = 0.
    val pruned = Classify.nbTrainScore(spark, docs, "doc_id", "text", "lang", minDf = 2)
      .collect()
      .map(r => r.getAs[Long]("doc") ->
        (r.getAs[String]("pred"), r.getAs[Double]("score")))
      .toMap
    assert(pruned.size == 4)
    // every doc's in-V evidence is llh = 0, so priors decide: en wins
    // everywhere — including doc 3, whose terms are ALL pruned and
    // which must take the no-in-vocabulary-tokens fallback
    val enPrior = q6(math.log(3.0 / 4)).doubleValue()
    Seq(1L, 2L, 3L, 4L).foreach { d =>
      assert(pruned(d)._1 == "en", s"doc $d must fall to the prior argmax")
      assert(math.abs(pruned(d)._2 - enPrior) < 1e-9, s"doc $d score")
    }
    // and minDf = 1 must be byte-identical to the default path
    val unpruned = Classify.nbTrainScore(spark, docs, "doc_id", "text", "lang", minDf = 1)
      .collect().map(_.toSeq).toSet
    val default = Classify.nbTrainScore(spark, docs, "doc_id", "text", "lang")
      .collect().map(_.toSeq).toSet
    assert(unpruned == default)
  }

  test("nbTrainApply: held-out scoring — OOV drops, all-OOV falls back to the train prior") {
    import spark.implicits._
    // train: two "en" docs over {the, cat}, one "fr" over {le, chat}
    val train = Seq(
      (1L, "the cat the cat", "en"),
      (2L, "the the", "en"),
      (3L, "le chat", "fr")
    ).toDF("doc_id", "text", "lang")
    val applyDocs = Seq(
      (10L, "the cat", "en"),      // in-vocab: must score as en
      (11L, "chat le chat", "fr"), // in-vocab: must score as fr
      (12L, "zzz qqq", "fr")       // every token OOV: train-prior fallback (en)
    ).toDF("doc_id", "text", "lang")
    val got = Classify.nbTrainApply(spark, train, applyDocs, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(got(10L) == (("en", "en")))
    assert(got(11L) == (("fr", "fr")))
    // highest-prior class is en (2 docs vs 1); fallback score = its lprior
    assert(got(12L) == (("fr", "en")))
    val fbScore = Classify.nbTrainApply(spark, train, applyDocs, "doc_id", "text", "lang")
      .filter(org.apache.spark.sql.functions.col("doc") === 12L)
      .collect().head.getDouble(3)
    val lpEn = BigDecimal(math.log(2.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fbScore == lpEn, s"fallback score must be the en prior, got $fbScore vs $lpEn")
    // self-scoring through the shared core matches nbTrainScore exactly
    assert(Classify.nbTrainApply(spark, train, train, "doc_id", "text", "lang")
        .orderBy("doc").collect().map(_.toSeq).toSeq
      == Classify.nbTrainScore(spark, train, "doc_id", "text", "lang")
        .orderBy("doc").collect().map(_.toSeq).toSeq)
  }

  test("evalMetrics: hand-computed confusion — per-class rows, macro/micro") {
    import spark.implicits._
    // actual → pred: a→a, a→b, b→b, b→b, c→b, a→d
    // a: support 3, tp 1, predN 1 → fp 0, fn 2; P=1, R=1/3, F1=2/(2+0+2)=0.5
    // b: support 2, tp 2, predN 4 → fp 2, fn 0; P=0.5, R=1, F1=4/6
    // c: support 1, tp 0, predN 0 → P=NULL, R=0, F1=0 (fn=1)
    // d: support 0, tp 0, predN 1 → P=0, R=NULL, F1=0 (fp=1)
    val scored = Seq(("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "b"), ("a", "d"))
      .toDF("actual", "pred")
    val got = Classify.evalMetrics(spark, scored).collect()
      .map(r => r.getString(0) -> r).toMap
    def m(l: String, i: Int): Any = got(l).get(i)
    assert(got.keySet == Set("(macro)", "(micro)", "a", "b", "c", "d"))
    assert((m("a", 1), m("a", 2), m("a", 3), m("a", 4)) == ((3L, 1L, 0L, 2L)))
    assert((m("a", 5), m("a", 6), m("a", 7)) == ((1.0, 1.0 / 3, 0.5)))
    assert((m("b", 5), m("b", 6), m("b", 7)) == ((0.5, 1.0, 4.0 / 6)))
    assert(m("c", 5) == null && m("c", 6) == 0.0 && m("c", 7) == 0.0)
    assert(m("d", 5) == 0.0 && m("d", 6) == null && m("d", 7) == 0.0)
    // micro = accuracy 3/6 everywhere; support totals the corpus
    assert((m("(micro)", 1), m("(micro)", 2)) == ((6L, 3L)))
    assert((m("(micro)", 5), m("(micro)", 6), m("(micro)", 7)) == ((0.5, 0.5, 0.5)))
    // macro over 4 classes, undefined → 0: P=(1+.5+0+0)/4, R=(1/3→0.333333+1)/4,
    // F1=(.5+0.666667)/4 — quantized decimals then one division
    assert(m("(macro)", 5) == 1.5 / 4)
    assert(m("(macro)", 6) == 1.333333 / 4)
    assert(m("(macro)", 7) == 1.166667 / 4)
    // macro row carries no counts
    assert(m("(macro)", 2) == null && m("(macro)", 3) == null && m("(macro)", 4) == null)
  }

  test("logisticTrain: learns a separable threshold; partition-invariant; scorer keep = margin sign") {
    import spark.implicits._
    // y = 1 iff x >= 0.5 — 20 points on a line, cleanly separable
    val pts = (0 until 20).map(i => (i.toLong, i / 19.0, if (i / 19.0 >= 0.5) 1 else 0))
    val f = pts.toDF("id", "x", "y")
    val fc = Seq("x")
    val wu = Classify.logisticTrain(f, "y", fc, iters = 50, lr = 2.0)
    // the learned boundary -w0/w1 sits inside the class gap, slope positive
    assert(wu(1) > 0, s"slope must be positive, got ${wu.mkString(",")}")
    val boundary = -wu(0).toDouble / wu(1).toDouble
    assert(boundary > 9.0 / 19 && boundary < 10.0 / 19,
      s"boundary $boundary must sit between the classes")
    // gradient sums are exact longs, so weights cannot depend on
    // partitioning or shuffle order
    val wu12 = Classify.logisticTrain(f.repartition(12), "y", fc, iters = 50, lr = 2.0)
    assert(wu.toSeq == wu12.toSeq, "training must be partition-invariant")
    val scored = Classify.logisticScore(f, "id", fc, wu).collect()
    scored.foreach { r =>
      assert(r.getBoolean(3) == (r.getLong(1) >= 0L), "keep must equal the margin sign rule")
    }
    val byId = scored.map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    pts.foreach { case (i, x, y) =>
      assert(byId(i) == (y == 1), s"separable data must classify cleanly at point $i")
    }
  }

  test("calibrationBins: hand bins, top-edge closure, exact decimal confidence") {
    import spark.implicits._
    val scored = Seq(
      (0.10, 0), (0.15, 1),          // bin 0 of 4: acc 0.5, conf 0.125
      (0.55, 1), (0.60, 1), (0.70, 0), // bin 2: acc 2/3
      (1.00, 1)                      // score 1.0 closes into bin 3, not 4
    ).toDF("score", "y")
    val got = Classify.calibrationBins(scored, "y", "score", bins = 4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(0L, 2L, 3L), s"empty bins absent, got ${got.keySet}")
    assert(got(0L).getLong(1) == 2 && got(0L).getDouble(3) == 0.5)
    assert(got(0L).getDouble(4) == 0.25 / 2)
    assert(got(2L).getLong(1) == 3 && got(2L).getDouble(3) == 2.0 / 3)
    assert(got(3L).getLong(1) == 1 && got(3L).getDouble(4) == 1.0,
      "score 1.0 must close into the last bin")
    // ECE from the output alone: sum(n*gap)/sum(n)
    val rows = got.values.toSeq
    val ece = rows.map(r => r.getLong(1) * r.getDouble(5)).sum / rows.map(_.getLong(1)).sum
    assert(ece > 0.0 && ece < 1.0)
  }

  test("isotonicCalibration: PAV pools violators, keeps monotone runs, minimax hand values") {
    import spark.implicits._
    // bins of 5 each with rates 0.6, 0.2, 0.4 → PAV pools all three
    // to 6/15 = 0.4 (merging 0.6 with 0.2 gives 0.4, tied with bin 2)
    def mk(rates: Seq[(Double, Int, Int)]) = rates.zipWithIndex.flatMap {
      case ((binLow, pos, n), _) =>
        (1 to pos).map(_ => (binLow + 0.01, 1)) ++
          (1 to (n - pos)).map(_ => (binLow + 0.01, 0))
    }.toDF("score", "y")
    val zig = mk(Seq((0.0, 3, 5), (0.25, 1, 5), (0.5, 2, 5)))
    val fit = Classify.isotonicCalibration(zig, "y", "score", bins = 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(fit(0L) == ((0.6, 0.4)) && fit(1L) == ((0.2, 0.4)) && fit(2L) == ((0.4, 0.4)),
      s"zigzag pools to the global 6/15: $fit")
    // already-monotone rates are a fixed point
    val mono = mk(Seq((0.0, 1, 5), (0.25, 2, 5), (0.5, 4, 5)))
    val mfit = Classify.isotonicCalibration(mono, "y", "score", bins = 4)
      .collect().map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4))).toMap
    assert(mfit.values.forall { case (raw, iso) => raw == iso },
      s"monotone input must pass through unchanged: $mfit")
    // single violating pair pools to the weighted mean
    val pair = mk(Seq((0.0, 3, 5), (0.25, 2, 5)))
    val pfit = Classify.isotonicCalibration(pair, "y", "score", bins = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(pfit(0L) == 0.5 && pfit(1L) == 0.5, s"$pfit")
    // fitted curve is always nondecreasing in the bin order
    val curve = Classify.isotonicCalibration(zig.unionAll(mono), "y", "score", bins = 4)
      .orderBy("bin").collect().map(_.getDouble(4))
    assert(curve.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)), curve.mkString(","))
  }

  test("isotonicCalibrationByKey: fan-out equals the global operator per key; grid guard trips") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (1 to 400).map { i =>
      val k = if (i % 3 == 0) "web" else if (i % 3 == 1) "book" else "code"
      val s = rng.nextDouble()
      val y = if (rng.nextDouble() < s * 0.8 + 0.1) 1 else 0
      (k, s, y)
    }
    val df = rows.toDF("src", "score", "y")
    val byKey = Classify.isotonicCalibrationByKey(df, "src", "y", "score", bins = 6)
      .collect().groupBy(_.getString(0))
    assert(byKey.keySet == Set("web", "book", "code"))
    byKey.foreach { case (k, got) =>
      val solo = Classify.isotonicCalibration(
          df.filter(org.apache.spark.sql.functions.col("src") === k), "y", "score", bins = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
      val g = got.sortBy(_.getLong(1)).map(r => (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
      assert(g.sameElements(solo), s"key $k: fan-out must equal the solo fit")
      // and each key's curve is nondecreasing
      assert(g.map(_._5).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    }
    // the keys×bins driver guard fails loudly before materializing
    val err = intercept[IllegalArgumentException] {
      Classify.isotonicCalibrationByKey(df, "src", "y", "score", bins = 6, maxCells = 4)
    }
    assert(err.getMessage.contains("maxCells"), err.getMessage)
  }

  test("isotonicCalibration: NULL score/label rows drop (the cusum NULL policy)") {
    import spark.implicits._
    val clean = Seq((0.1, Some(0)), (0.2, Some(1)), (0.6, Some(1)), (0.9, Some(1)))
      .map { case (s, y) => (Option(s), y) }
    val dirty = clean ++ Seq((None: Option[Double], Some(1)), (Some(0.5), None))
    val a = Classify.isotonicCalibration(clean.toDF("score", "y"), "y", "score", bins = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    val b = Classify.isotonicCalibration(dirty.toDF("score", "y"), "y", "score", bins = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(a.nonEmpty && a.sameElements(b),
      s"NULL rows must not shift the curve: ${a.toSeq} vs ${b.toSeq}")
  }

  test("auc: hand ranks with ties, perfect and reversed separation, degenerate NULL") {
    import spark.implicits._
    // pos scores {3, 2, 2}, neg {2, 1}: pairwise 4 wins + 2 half-credit
    // ties of the two pos-2s against the neg-2 -> AUC = 5/6
    val scored = Seq((3L, 1), (2L, 1), (2L, 1), (2L, 0), (1L, 0)).toDF("s", "y")
    val r = Classify.auc(scored, "y", "s").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2)
    assert(r.getDouble(2) == 5.0 / 6.0, s"auc ${r.getDouble(2)}")
    // perfect separation -> 1.0; reversed -> 0.0
    val sep = Seq((10L, 1), (9L, 1), (2L, 0), (1L, 0)).toDF("s", "y")
    assert(Classify.auc(sep, "y", "s").collect()(0).getDouble(2) == 1.0)
    val rev = Seq((1L, 1), (2L, 1), (9L, 0), (10L, 0)).toDF("s", "y")
    assert(Classify.auc(rev, "y", "s").collect()(0).getDouble(2) == 0.0)
    // single-class input: NULL, not NaN
    val one = Seq((1L, 1), (2L, 1)).toDF("s", "y")
    assert(Classify.auc(one, "y", "s").collect()(0).isNullAt(2))
  }

  test("agreementKappa: hand contingency, degenerate NULL, null-label guard") {
    import spark.implicits._
    // raters: agree on 6 of 10; marginals A: 7 yes / 3 no, B: 5/5
    // po = 0.6, pe = (7*5 + 3*5)/100 = 0.5, kappa = 0.1/0.5 = 0.2
    val rated = (Seq.fill(4)(("y", "y")) ++ Seq.fill(3)(("y", "n")) ++
      Seq.fill(1)(("n", "y")) ++ Seq.fill(2)(("n", "n"))).toDF("ra", "rb")
    val r = Classify.agreementKappa(rated, "ra", "rb").collect()(0)
    assert(r.getLong(0) == 10 && r.getLong(1) == 6)
    assert(r.getDouble(2) == 0.6 && r.getDouble(3) == 0.5)
    assert(math.abs(r.getDouble(4) - 0.2) < 1e-15, s"kappa ${r.getDouble(4)}")
    // both raters constant and identical: pe = 1, kappa undefined -> NULL
    val const = Seq(("y", "y"), ("y", "y")).toDF("ra", "rb")
    assert(Classify.agreementKappa(const, "ra", "rb").collect()(0).isNullAt(4))
    // null labels fail loudly
    val nulls = Seq((Some("y"), Some("y")), (None, Some("n"))).toDF("ra", "rb")
    val e = intercept[IllegalArgumentException] {
      Classify.agreementKappa(nulls, "ra", "rb").collect()
    }
    assert(e.getMessage.contains("non-null labels"), e.getMessage)
  }

  test("logisticTrain guards: null features, empty frame, weight arity") {
    import spark.implicits._
    val nulls = Seq((1L, Some(1.0), 1), (2L, None, 0)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Classify.logisticTrain(nulls, "y", Seq("x"), iters = 1, lr = 1.0)
    }
    assert(e.getMessage.contains("non-null label and features"), e.getMessage)
    val empty = Seq.empty[(Long, Double, Int)].toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Classify.logisticTrain(empty, "y", Seq("x"), iters = 1, lr = 1.0)
    }
    val f = Seq((1L, 0.2, 1)).toDF("id", "x", "y")
    intercept[IllegalArgumentException] {
      Classify.logisticScore(f, "id", Seq("x"), Array(1L, 2L, 3L))
    }
  }

  test("evalMetrics rejects null labels with the contract message (ADVICE r9)") {
    import spark.implicits._
    val scored = Seq(("a", Some("a")), ("b", None))
      .toDF("actual", "pred")
    val e = intercept[IllegalArgumentException] {
      Classify.evalMetrics(spark, scored).collect()
    }
    assert(e.getMessage.contains("non-null actual and pred labels"), e.getMessage)
  }

  test("cross-class evidence flows through the smoothed zero counts") {
    // doc 3 under en uses the alpha-smoothed zero counts:
    // ln((0+1)/(4+4)) per term — fr must still win on its own counts.
    val frScore = q6(math.log(1.0 / 4))
      .add(q6(math.log(2.0 / 6))).add(q6(math.log(2.0 / 6)))
    assert(math.abs(got(3L)._3 - frScore.doubleValue()) < 1e-9)
    val enScore = q6(math.log(3.0 / 4))
      .add(q6(math.log(1.0 / 8))).add(q6(math.log(1.0 / 8)))
    assert(frScore.doubleValue() > enScore.doubleValue())
  }
}
