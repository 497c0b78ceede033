package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * 3 runs per query, reporting the MINIMUM. This host's virtualization
  * stalls runs by 10-100x (observed: the same query at 0.85 s, 12.5 s
  * and 71 s within one loop) and the noise is strictly additive — a run
  * is never faster than the query's true cost — so the minimum is the
  * unbiased steady-state estimate, while a median still carries a stall
  * whenever 2 of 3 runs stall. All per-run times go to stderr AND into
  * the JSON ("runs") so the jitter stays visible. Prints ONE COMPACT
  * JSON metric line to stdout (total + per-query minimums + failed —
  * no "runs" map: the driver's captured stdout tail truncated mid-array
  * on the full map in round 2 → parsed:null) and writes the FULL JSON
  * (with "runs") to SPARK_GRAFT_BENCH_OUT (default bench_out.json) —
  * sbt wraps forked stdout in [info], which broke the driver's stdout
  * parse in round 1.
  *
  * A query that throws in any run is reported in "failed" and excluded
  * from the total rather than silently contributing its time-to-failure
  * (a query can fail at bench scale yet pass the smaller correctness
  * gate).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
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
    val failed = ListBuffer.empty[String]
    // dev fast loop: SPARK_GRAFT_BENCH_ONLY=q_a,q_b times a subset
    // (pair with SPARK_GRAFT_BENCH_OUT so the committed artifact's
    // full-corpus bench_out.json is not clobbered by a partial run)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .sortBy(_._1).flatMap { case (name, fn) =>
      val times = (1 to runs).map { i =>
        // label the jobs (guide §1.5) so UI/eventlog debugging can map
        // stages back to queries; costs nothing measured
        spark.sparkContext.setJobDescription(s"bench: $name run $i")
        // toRdd executes the query's own optimized plan (projections,
        // sorts and all) and counts InternalRows; a DataFrame count()
        // would instead re-optimize with the aggregate on top, letting
        // Catalyst prune away the very work being measured.
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name run $i FAILED: ${e.getClass.getName}: ${e.getMessage}")
              false
          }
        val t = (System.nanoTime() - t0) / 1e9
        // Drop cached intermediates so queries are timed independently.
        // Dedup/IVF intermediates use localCheckpoint, which clearCache
        // does NOT free — those blocks are released by the ContextCleaner
        // only after the checkpointed RDD is GC'd, so nudge a GC here to
        // keep storage-memory pressure from leaking into later queries.
        spark.catalog.clearCache()
        System.gc()
        spark.sparkContext.setJobDescription(null)
        (t, ok)
      }
      if (times.exists(!_._2)) { failed += name; None }
      else {
        val ts = times.map(_._1).sorted
        val best = ts.head
        System.err.println(
          f"[bench] $name%-28s min=$best%8.3f  runs=[${times.map(t => f"${t._1}%.3f").mkString(", ")}]")
        if (ts.last > 5 * ts.head && ts.last - ts.head > 2.0)
          System.err.println(f"[bench] $name%-28s JITTER: ${ts.last / ts.head}%.1fx spread across runs (virtualized-host stall; min reported)")
        Some((name, best, times.map(_._1)))
      }
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val allRuns = results.map { case (k, _, rs) =>
      // Locale.ROOT: a comma-decimal default locale would corrupt the JSON
      "\"" + k + "\":" + rs.map(r => String.format(java.util.Locale.ROOT, "%.3f", Double.box(r)))
        .mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // Compact line for stdout (the driver captures a bounded tail; the
    // full per-run map overflowed it in round 2), full JSON to the file.
    val compact =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sfDir"}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$allRuns,"failed":$fl,"sf":"$sfDir"}"""
    // SHORT final summary line (r13 verdict #2): the driver's stdout
    // capture keeps only the last ~2000 bytes, and the full per-query
    // line is ~17 KB — its leading "metric" key never lands in the tail
    // window, so the driver parsed null for two rounds. This line is
    // a few hundred bytes and printed LAST, so any tail window contains
    // one complete parseable metric JSON. The full per-query line and
    // bench_out.json are unchanged.
    val summary =
      s"""{"metric":"total_summary","value":$total,"unit":"sec","n":${results.size},"failed":$fl,"sf":"$sfDir"}"""
    println(compact)
    println(summary)
    Files.write(Paths.get(outPath), (full + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
