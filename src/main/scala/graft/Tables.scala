package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (see TESTDATA.md).
  *
  * Every table is a plain parquet directory/file; `spark.read.parquet`
  * gives Catalyst full pushdown (column pruning + predicate pushdown
  * reach the scan). At 100 TB these would be partitioned directories —
  * the reader API is identical, so nothing here changes at scale.
  *
  * Scans are NOT fanned out here: a blanket repartition taxes every
  * small aggregate over these tables with parallelism-many task
  * launches per job (measured r13: +1–2 s on the many-small-jobs
  * queries — drift report, curation gate, the training-run funnel).
  * Per-row-CPU-heavy operators fan their OWN input instead
  * ([[graft.core.Fan.out]]), which is where single-task scan stages
  * actually hurt.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // The corpus stores events.ts as parquet TIMESTAMP(NANOS), which the
    // vectorized reader rejects; read nanos as long (we order by the
    // integer event_id everywhere, so the ns column is never compared).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
