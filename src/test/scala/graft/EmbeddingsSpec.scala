package graft

import org.apache.spark.sql.functions._

import graft.llm.Embeddings

/** The PCA pipeline's driver-side eigen step (the distributed gram
  * pass carries the DuckDB oracle; the power iteration and the
  * literal-re-entry projection are pinned here): dominant-axis
  * recovery on a constructed anisotropic cloud, gram/first-moment
  * bookkeeping on a hand case, and end-to-end centered projection.
  */
class EmbeddingsSpec extends SparkSpec {

  import spark.implicits._

  test("gram: hand vectors — upper triangle, first moments, counts") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f, -1.0f))
    ).toDF("vec_id", "embedding")
    val got = Embeddings.gram(df, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // Σq1² = 1 + 9, Σq1q2 = 2 − 3, Σq2² = 4 + 1; firsts 4 and 1
    assert(got == Map(
      (1L, 1L) -> ((2L, 10.0)), (1L, 2L) -> ((2L, -1.0)), (2L, 2L) -> ((2L, 5.0)),
      (1L, -1L) -> ((2L, 4.0)), (2L, -1L) -> ((2L, 1.0))), s"got $got")
  }

  test("gram: non-finite component fails naming the operator contract (ADVICE r9)") {
    val df = Seq((1L, Seq(1.0f, Float.NaN))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Embeddings.gram(df, "vec_id", "embedding").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("forbids non-finite vector components")),
      s"expected the loud contract failure, got: ${messages(e).mkString(" | ")}")
  }

  test("gram: sheet is partition-invariant (buffer merge ≡ single fold)") {
    val pts = (0 until 97).map(k =>
      (k.toLong, Seq((k * 0.37 - 11.1).toFloat, (3.0 - k * 0.05).toFloat, (k % 5).toFloat)))
    val df = pts.toDF("vec_id", "embedding")
    def sheet(parts: Int) =
      Embeddings.gram(df.repartition(parts), "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getDouble(3)))).toMap
    val one = sheet(1)
    assert(one.size == 3 * 4 / 2 + 3)
    assert(sheet(7) == one, "merged task buffers must equal the single-partition fold")
  }

  test("gram: ragged dimensions fail loudly (frozen-geometry contract)") {
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Embeddings.gram(df.repartition(1), "vec_id", "embedding").collect()
    }
    assert(e.getMessage.contains("fixed-dimension") ||
      Option(e.getCause).exists(_.getMessage.contains("fixed-dimension")),
      s"expected the fixed-dimension require, got: ${e.getMessage}")
  }

  test("project: out-of-contract inputs fail loudly, not silently wrap") {
    def d6(x: Double) = new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    val df = Seq((1L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    // weight magnitude beyond 1
    intercept[IllegalArgumentException] {
      Embeddings.project(df, "vec_id", "embedding", Seq(d6(2.0), d6(0.1)), d6(0))
    }
    // more than 64 weights
    intercept[IllegalArgumentException] {
      Embeddings.project(df, "vec_id", "embedding", (1 to 65).map(_ => d6(0.1)), d6(0))
    }
    // component beyond the 1e3 fixed-point bound → raise_error at runtime
    val wide = Seq((1L, Seq(2000.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Embeddings.project(wide, "vec_id", "embedding", Seq(d6(0.1), d6(0.1)), d6(0)).collect()
    }
    def anyMsg(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("fixed-point bound")) || anyMsg(t.getCause))
    assert(anyMsg(e), s"expected the fixed-point bound raise_error, got: ${e.getMessage}")
  }

  test("pcaComponent recovers a planted dominant axis; projection is centered") {
    // cloud along axis (3,4)/5 with a small orthogonal wobble and an
    // off-origin mean — variance along the axis dominates 25:1
    val axis = (0.6, 0.8)
    val pts = (0 until 200).map { k =>
      val t = (k % 41).toDouble / 4.0 - 5.0        // spread along the axis
      val s = ((k % 7).toDouble - 3.0) / 30.0       // orthogonal wobble
      (k.toLong, Seq(
        (10.0 + t * axis._1 - s * axis._2).toFloat,
        (20.0 + t * axis._2 + s * axis._1).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val (w, c, lambda) = Embeddings.pcaComponent(spark, df, "vec_id", "embedding")
    val u = w.map(_.doubleValue)
    val dot = math.abs(u(0) * axis._1 + u(1) * axis._2)
    assert(dot > 0.999, s"component $u must align with the planted axis, |dot| = $dot")
    assert(lambda > 1.0, s"dominant eigenvalue must carry the spread, got $lambda")
    // unit length survives quantization
    assert(math.abs(u.map(x => x * x).sum - 1.0) < 1e-4)
    // the projected-mean literal centers the scores
    val scores = Embeddings.project(df, "vec_id", "embedding", w, c)
      .select(col("score")).as[Double].collect()
    assert(math.abs(scores.sum / scores.length) < 1e-3,
      s"centered projection must have ~zero mean, got ${scores.sum / scores.length}")
    // and the score spread along u matches the eigenvalue scale-wise
    val varAlong = scores.map(x => x * x).sum / scores.length
    assert(varAlong > 0.8 * lambda && varAlong < 1.2 * lambda,
      s"projected variance $varAlong vs eigenvalue $lambda")
  }

  test("pcaComponents: deflation yields orthogonal components with ordered eigenvalues") {
    // a 3-D cloud with planted variances 25 : 4 : ~0 along three known
    // orthogonal axes — deflation must recover them in order
    val pts = (0 until 300).map { k =>
      val t = (k % 25).toDouble / 2.4 - 5.0   // big axis (1,0,0)
      val s = ((k % 9).toDouble - 4.0) / 2.0  // mid axis (0, .6, .8)
      (k.toLong, Seq(t.toFloat, (0.6 * s).toFloat, (0.8 * s).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val comps = Embeddings.pcaComponents(spark, df, "vec_id", "embedding", nComponents = 2)
    val Seq((w1, _, l1), (w2, _, l2)) = comps
    val u1 = w1.map(_.doubleValue)
    val u2 = w2.map(_.doubleValue)
    assert(l1 > l2, s"eigenvalues must be non-increasing: $l1 vs $l2")
    assert(math.abs(u1(0)) > 0.999, s"first component must be the big axis, got $u1")
    assert(math.abs(u2(1) * 0.6 + u2(2) * 0.8) > 0.999,
      s"second component must be the mid axis, got $u2")
    val dot = u1.zip(u2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-3, s"components must be orthogonal, dot = $dot")
  }

  test("pcaComponentsBy / axisDrift: per-cohort axes off one grouped pass") {
    // cohort "x" spreads along (1,0), cohort "y" along (0,1); the
    // pooled corpus is dominated by x's larger spread
    val pts = (0 until 120).map { kk =>
      val t = (kk % 30).toDouble / 3.0 - 4.8
      if (kk % 2 == 0) ("x", kk.toLong, Seq((t * 2.0).toFloat, ((kk % 5) / 50.0).toFloat))
      else ("y", kk.toLong, Seq(((kk % 7) / 70.0).toFloat, t.toFloat))
    }
    import spark.implicits._
    val df = pts.toDF("grp", "vec_id", "embedding")
    val byGrp = Embeddings.pcaComponentsBy(spark, df, "grp", "embedding", nComponents = 1)
    val ux = byGrp("x").head._1.map(_.doubleValue)
    val uy = byGrp("y").head._1.map(_.doubleValue)
    assert(math.abs(ux(0)) > 0.999, s"x cohort axis must be (1,0), got $ux")
    assert(math.abs(uy(1)) > 0.999, s"y cohort axis must be (0,1), got $uy")
    // grouped sheets must equal per-cohort gram exactly
    val gx = Embeddings.gramBy(df, "grp", "embedding")
      .filter(col("grp") === "x").drop("grp")
      .collect().map(_.toSeq).toSet
    val gx1 = Embeddings.gram(df.filter(col("grp") === "x"), "vec_id", "embedding")
      .collect().map(_.toSeq).toSet
    assert(gx == gx1, "gramBy slice must equal the filtered gram")
    // drift report: x aligns with the pooled axis, y is near-orthogonal
    val drift = Embeddings.axisDrift(spark, df, "grp", "embedding")
      .map { case (g, l, c) => g -> ((l, c)) }.toMap
    assert(drift("x")._2 > 0.99, s"x must align with the corpus axis, got ${drift("x")}")
    assert(drift("y")._2 < 0.2, s"y must be near-orthogonal, got ${drift("y")}")
    assert(drift("x")._1 > drift("y")._1, "x carries the larger spread")
  }

  test("project: exact fixed-point arithmetic matches the hand computation") {
    val df = Seq((7L, Seq(0.5f, -0.25f))).toDF("vec_id", "embedding")
    def d6(x: Double) = new java.math.BigDecimal(x).setScale(6, java.math.RoundingMode.HALF_UP)
    val got = Embeddings.project(df, "vec_id", "embedding",
        Seq(d6(0.1), d6(-0.2)), d6(0.01))
      .collect().head.getDouble(1)
    // (0.5·0.1 + (−0.25)·(−0.2)) − 0.01 = 0.05 + 0.05 − 0.01 = 0.09
    assert(got == 0.09, s"got $got")
  }
}
