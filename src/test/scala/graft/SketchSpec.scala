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

  test("duplicate values across docs never double-fill the sketch") {
    // two docs with identical text: union of hash sets == each set
    val dup = Seq((1L, "one two three four five six"), (2L, "one two three four five six"))
      .toDF("doc_id", "text")
    val whole = Sketches.distinctShingles(dup.withColumn("g", lit("all")), "g", "text", 8)
      .collect().head
    assert(whole.getAs[Long]("n_mins") === 4L) // 6 words -> 4 shingles
  }
}
