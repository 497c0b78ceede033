package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.llm.Dedup

/** Regression guard for the round-1 codegen bug: companion-object `eval`
  * methods on Expression case classes get no static forwarder (the name
  * collides with the inherited `Expression.eval`), so Janino could not
  * compile the generated Java and every simhash/minhash stage silently
  * fell back to interpreted execution. With
  * `spark.sql.codegen.fallback=false` a whole-stage compile failure
  * throws instead of falling back, so these tests fail loudly if the
  * kernels ever become codegen-incompatible again.
  */
class CodegenSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  private def withNoCodegenFallback[A](body: => A): A = {
    val key = "spark.sql.codegen.fallback"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  // WholeStageCodegenExec prints as "*(n)" in simple plan text; walk the
  // tree (through AQE's final plan) instead of string-matching.
  private def hasCodegenSpan(p: SparkPlan): Boolean = p.exists {
    case _: WholeStageCodegenExec => true
    case a: AdaptiveSparkPlanExec => hasCodegenSpan(a.executedPlan)
    // AQE stage wrappers hold their subtree as a member, not a child —
    // a bare `exists` never descends into them
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      hasCodegenSpan(q.plan)
    case _ => false
  }

  test("simhashDocs stage is whole-stage-codegen'd and compiles") {
    withNoCodegenFallback {
      val df = Dedup.simhashDocs(docs, "doc_id", "text")
      // collect(), not count(): count plans a SEPARATE aggregate and
      // never finalizes df's own AQE plan (repo invariant) — with the
      // r13 scan fan-out the projection sits above an exchange, so the
      // codegen span only exists once the stage materializes
      assert(df.collect().length > 0) // forces Janino compile; throws on failure
      assert(hasCodegenSpan(df.queryExecution.executedPlan),
        s"simhash projection must be inside a codegen span, got:\n${df.queryExecution.executedPlan}")
    }
  }

  test("minhash signature + band stages are whole-stage-codegen'd and compile") {
    withNoCodegenFallback {
      // the signature projection itself (inside minhashPairs it sits in
      // a localCheckpoint'd RDD lineage, invisible to plan text)
      import org.apache.spark.sql.functions.col
      val sigs = docs.select(
        graft.llm.TextOps.minhashSignature(
          graft.llm.TextOps.shingleHashes(col("text"))).as("sig"))
      assert(sigs.count() > 0)
      assert(hasCodegenSpan(sigs.queryExecution.executedPlan),
        s"graft_minhash projection must sit inside a codegen span, got:\n${sigs.queryExecution.executedPlan}")
      // and the full pairs pipeline compiles end-to-end
      Dedup.minhashPairs(docs, "doc_id", "text", 0.5).count()
    }
  }

  test("simhashPairs end-to-end compiles with codegen fallback disabled") {
    withNoCodegenFallback {
      Dedup.simhashPairs(docs, "doc_id", "text", 3, chunks = 8).count()
    }
  }

  test("text quality (graft_alpha_count) is whole-stage-codegen'd and compiles") {
    withNoCodegenFallback {
      val df = graft.llm.TextAnalysis.quality(docs, "doc_id", "text")
      assert(df.count() > 0)
      assert(hasCodegenSpan(df.queryExecution.executedPlan),
        s"alpha-count projection must sit inside a codegen span, got:\n${df.queryExecution.executedPlan}")
    }
  }

  test("ccDetect's Luhn HOF fold compiles under whole-stage codegen") {
    withNoCodegenFallback {
      val df = graft.llm.TextAnalysis.ccDetect(docs, "doc_id", "text")
      // collect() finalizes the AQE plan past the r13 fan-out exchange
      // (count() plans a separate aggregate — repo invariant)
      assert(df.collect().length > 0)
      assert(hasCodegenSpan(df.queryExecution.executedPlan),
        s"the checksum projection must sit inside a codegen span:\n${df.queryExecution.executedPlan}")
    }
  }

  test("rollingSlope's window statistics compile under whole-stage codegen") {
    withNoCodegenFallback {
      import org.apache.spark.sql.functions.col
      val e = Tables.events(spark, dir).select("user_id", "event_id", "value")
      val df = graft.operators.Windows.rollingSlope(
        e, "user_id", col("event_id"), col("value"), windowSize = 4)
      // collect() executes THIS dataset's queryExecution (count()
      // would plan a separate aggregate), finalizing the AQE plan so
      // the codegen spans are visible. WindowExec itself never
      // codegens; the projections and filters around it must compile.
      assert(df.collect().length > 0)
      assert(hasCodegenSpan(df.queryExecution.executedPlan),
        s"slope arithmetic must sit inside a codegen span:\n${df.queryExecution.executedPlan}")
    }
  }
}
