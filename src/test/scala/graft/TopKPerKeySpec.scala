package graft

import org.apache.spark.sql.functions._

import graft.plans.{TopKPerKey, TopKPerKeyExec}

/** The custom bounded-heap per-key top-k physical operator. */
class TopKPerKeySpec extends SparkSpec {

  import spark.implicits._

  test("topKPerKey == window row_number formulation on random data") {
    val rng = new scala.util.Random(11)
    val df = (1 to 5000).map(i => (s"k${i % 17}", i.toLong, rng.nextDouble()))
      .toDF("key", "id", "score")
    val custom = TopKPerKey(spark, df, Seq("key"), Seq("score" -> true, "id" -> false), 3)
      .select("key", "id").as[(String, Long)].collect().toSet
    val window = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("key").orderBy(col("score").desc, col("id"))
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select("key", "id").as[(String, Long)].collect().toSet
    }
    assert(custom == window && custom.size == 17 * 3)
  }

  test("physical plan uses TopKPerKeyExec with one hash exchange, no sort") {
    val df = Seq(("a", 1L, 0.5), ("a", 2L, 0.7), ("b", 3L, 0.1)).toDF("key", "id", "score")
    val top = TopKPerKey(spark, df, Seq("key"), Seq("score" -> true), 1)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.toLowerCase.contains("sort ")) // no partition sort inserted
    assert(top.collect().map(r => (r.getString(0), r.getLong(1))).toSet == Set("a" -> 2L, "b" -> 3L))
  }

  test("k larger than group size returns whole groups, best-first") {
    val df = Seq(("a", 1L, 0.9), ("a", 2L, 0.1)).toDF("key", "id", "score")
    val rows = TopKPerKey(spark, df, Seq("key"), Seq("score" -> true), 10)
      .select("id").as[Long].collect().toList
    assert(rows == List(1L, 2L))
  }
}
