package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Co-located joins via write-time bucketing: both sides bucketed on
  * the join key must join (and aggregate) WITHOUT an exchange — the
  * layout the engine relies on at 100 TB to keep recurring fact⋈fact
  * joins shuffle-free.
  */
class BucketingSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // the in-memory catalog forgets tables across JVMs but the managed
    // location survives — remove it so re-runs don't collide
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(loc)
    }
  }

  test("bucketed tables join and aggregate with zero exchanges") {
    val dir = "/root/testdata/sf0.001"
    dropTable("b_orders"); dropTable("b_customer")
    Bucketing.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice"),
      "b_orders", "o_custkey", 4)
    Bucketing.writeBucketed(
      Tables.customer(spark, dir).select(col("c_custkey"), col("c_name")),
      "b_customer", "c_custkey", 4)
    // disable broadcast so the join would otherwise shuffle both sides
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = Bucketing.read(spark, "b_orders")
        .join(Bucketing.read(spark, "b_customer"),
          col("o_custkey") === col("c_custkey"))
      val jPlan = joined.queryExecution.executedPlan.toString
      assert(!jPlan.contains("Exchange"),
        s"bucketed equi-join must be exchange-free:\n$jPlan")
      assert(joined.count() > 0)

      val agg = Bucketing.read(spark, "b_orders")
        .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("s"))
      val aPlan = agg.queryExecution.executedPlan.toString
      assert(!aPlan.contains("Exchange"),
        s"aggregation on the bucket key must be exchange-free:\n$aPlan")
      // and it's the same result the unbucketed plan produces (sums
      // via DECIMAL: double accumulation order differs across layouts)
      def sums(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("s"))
        .collect().map(r => (r.getLong(0), r.getDecimal(1))).toSet
      assert(sums(Bucketing.read(spark, "b_orders")) == sums(Tables.orders(spark, dir)))
    }
  }
}
