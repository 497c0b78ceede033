package graft

import java.nio.file.Files

import graft.sources.Sources

/** Source readers (SURVEY §2.1 #6-9). */
class SourcesSpec extends SparkSpec {

  import spark.implicits._

  test("fileReader replays CSV; key fan-out duplicates every row per key") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("data.csv")
    Files.writeString(f, "user,rating\nalice,4.5\nbob,3.0\n")
    val base = Sources.fileReader(spark, f.toString)
    assert(base.count() == 2)
    assert(base.columns.toSeq == Seq("user", "rating"))
    assert(base.filter($"user" === "alice").select("rating").as[Double].head() == 4.5)
    val fanned = Sources.fileReader(spark, f.toString, numKeys = 3)
    assert(fanned.count() == 6)
    assert(fanned.select("key").distinct().count() == 3)
  }

  test("fakeReader grid: numKeys × timesteps rows, value 1.0, unique seq") {
    val df = Sources.fakeReader(spark, numKeys = 4, timesteps = 7)
    assert(df.count() == 28)
    assert(df.select("seq").distinct().count() == 28)
    assert(df.select("value").distinct().as[Double].collect().toList == List(1.0))
  }

  test("rate source constructs a streaming plan with the FakeReader shape") {
    val df = Sources.rate(spark, rowsPerSecond = 5, numKeys = 3)
    assert(df.isStreaming)
    assert(df.columns.toSeq == Seq("key", "value", "timestamp", "seq"))
  }

  test("kafka record decode: JSON body parsed, key fallback, malformed -> nulls") {
    import org.apache.spark.sql.functions._
    val ts = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    val raw = Seq(
      // body carries its own key: wins over the message key
      ("m1", """{"key":"u7","value":4.5,"send_time":1.0,"create_time":2.0}""", ts),
      // no body key: fall back to the message key
      ("m2", """{"value":9.0,"send_time":3.0,"create_time":4.0}""", ts),
      // malformed body: null fields, message key survives, no crash
      ("m3", "not json", ts)
    ).toDF("key", "value", "timestamp")
    val out = Sources.decodeRecords(raw).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toList
    assert(out == List(("u7", Some(4.5)), ("m2", Some(9.0)), ("m3", None)))
  }
}
