package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/JIT, the parquet reader, and shuffle machinery so
    // whichever query runs first isn't charged session startup.
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      // toRdd executes the query's own optimized plan (projections,
      // sorts and all) and counts InternalRows; a DataFrame count()
      // would instead re-optimize with the aggregate on top, letting
      // Catalyst prune away the very work being measured.
      // Best of 2 runs: steady-state cost, not host-scheduling luck.
      val dt = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count() } catch { case _: Throwable => -1L }
        val t = (System.nanoTime() - t0) / 1e9
        // Drop cached intermediates (dedup signature tables etc.) so
        // queries are timed independently, not under accumulated
        // storage-memory pressure.
        spark.catalog.clearCache()
        t
      }.min
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
