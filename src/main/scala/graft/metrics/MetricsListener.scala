package graft.metrics

import java.io.{File, FileOutputStream, OutputStreamWriter}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Query-level observability, the Spark-native analog of ralf's metric
  * snapshots (per-operator counters ralf/v2/operator.py:97-106, windowed
  * throughput/latency ralf/v2/utils.py:36-69, v1 snapshot loop
  * ralf/core.py:67-83): a QueryExecutionListener appending one JSON line
  * per completed action to a JSONL file.
  *
  * Where ralf polls actor queues, Spark already accounts every operator
  * via SQLMetrics — the listener just surfaces the roll-up: action name,
  * wall-clock nanos, output row count of the root operator, and the
  * failure class if the action threw. Per-operator detail stays
  * available in the Spark UI / metrics sink; this file is the cheap
  * always-on trail a pipeline operator tails.
  */
final class MetricsListener(path: String) extends QueryExecutionListener {

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private def appendLine(line: String): Unit = synchronized {
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new OutputStreamWriter(new FileOutputStream(f, true), StandardCharsets.UTF_8)
    try { w.write(line); w.write("\n") } finally w.close()
  }

  private def record(
      funcName: String,
      qe: QueryExecution,
      durationNs: Long,
      failure: Option[Throwable]
  ): Unit = {
    // defensive: on a FAILED action, touching qe.executedPlan can re-run
    // optimization (ConvertToLocalRelation evaluates expressions over
    // local data) and re-throw the query's own error inside the
    // listener — the metrics line must still be written
    val rows = scala.util.Try(
      qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    ).toOption.flatten
    val fields = Seq(
      Some(s""""action":"${esc(funcName)}""""),
      Some(s""""duration_ms":${durationNs / 1000000}"""),
      rows.map(r => s""""output_rows":$r"""),
      Some(s""""status":"${if (failure.isEmpty) "ok" else "failed"}""""),
      failure.map(e => s""""error":"${esc(e.getClass.getName)}"""")
    ).flatten
    appendLine(fields.mkString("{", ",", "}"))
  }

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    record(funcName, qe, durationNs, None)

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    record(funcName, qe, 0L, Some(exception))
}

object MetricsListener {
  /** Attach a JSONL metrics trail to the session; returns the listener
    * so callers can unregister it.
    */
  def attach(spark: SparkSession, path: String): MetricsListener = {
    val l = new MetricsListener(path)
    spark.listenerManager.register(l)
    l
  }

  def detach(spark: SparkSession, l: MetricsListener): Unit =
    spark.listenerManager.unregister(l)
}
