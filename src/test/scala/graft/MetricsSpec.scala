package graft

import graft.metrics.MetricsListener

/** The JSONL metrics trail (ralf's snapshot/counter analog). */
class MetricsSpec extends SparkSpec {

  test("listener appends one JSON line per completed action with rows and duration") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-metrics").toString + "/m.jsonl"
    val l = MetricsListener.attach(spark, path)
    try {
      Seq(1, 2, 3).toDF("x").filter("x > 1").count()
      // the listener fires asynchronously on the listener bus; poll
      var tries = 0
      while (!new java.io.File(path).exists() && tries < 100) { Thread.sleep(100); tries += 1 }
      val lines = scala.io.Source.fromFile(path).getLines().toList
      assert(lines.nonEmpty, "expected at least one metrics line")
      val line = lines.head
      assert(line.contains(""""action":"count""""))
      assert(line.contains(""""status":"ok""""))
      assert(line.contains(""""duration_ms":"""))
    } finally MetricsListener.detach(spark, l)
  }
}
