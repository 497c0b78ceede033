package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.serve.FeatureServer
import graft.state.TempViewConnector

/** The reference's HTTP client contract (ralf/table.py:159-213 served
  * routes, ralf/tests/test_client.py): point query hit / miss / bad key,
  * and bulk query, over a live local server.
  */
class ServeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true)))

  private def get(port: Int, path: String): HttpResponse[String] = {
    val client = HttpClient.newHttpClient()
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
  }

  test("point/bulk HTTP façade: hit, miss=404, malformed=400, bulk all rows") {
    import scala.jdk.CollectionConverters._
    val c = new TempViewConnector(spark, "key", schema, s"t_serve_${System.nanoTime()}")
    c.upsert(spark.createDataFrame(
      Seq(Row(1L, "alpha", 0.5), Row(2L, "beta \"q\"", null)).asJava, schema))
    val srv = new FeatureServer(c)
    srv.start()
    try {
      val port = srv.boundPort
      val hit = get(port, "/point?key=1")
      assert(hit.statusCode() == 200)
      assert(hit.body() == """{"row":{"key":1,"name":"alpha","score":0.5}}""")
      // null field + quote escaping survive the wire
      val hit2 = get(port, "/point?key=2")
      assert(hit2.body() == """{"row":{"key":2,"name":"beta \"q\"","score":null}}""")
      // miss: the KeyError analog
      assert(get(port, "/point?key=999").statusCode() == 404)
      // malformed key for a Long-keyed table
      assert(get(port, "/point?key=abc").statusCode() == 400)
      assert(get(port, "/point").statusCode() == 400)
      // bulk
      val bulk = get(port, "/bulk")
      assert(bulk.statusCode() == 200)
      assert(bulk.body().contains(""""key":1""") && bulk.body().contains(""""key":2"""))
    } finally srv.stop()
  }

  test("wire JSON stays valid for control characters and non-finite doubles") {
    import scala.jdk.CollectionConverters._
    val c = new TempViewConnector(spark, "key", schema, s"t_serve_esc_${System.nanoTime()}")
    // raw U+0001 built programmatically (a source literal would be
    // mangled by scalac's unicode-escape pass)
    c.upsert(spark.createDataFrame(
      Seq(Row(1L, "line1\nline2\ttabbed" + 1.toChar, Double.NaN),
        Row(2L, "inf", Double.PositiveInfinity)).asJava, schema))
    val srv = new FeatureServer(c)
    srv.start()
    try {
      val port = srv.boundPort
      val r1 = get(port, "/point?key=1")
      assert(r1.statusCode() == 200)
      assert(r1.body() ==
        """{"row":{"key":1,"name":"line1\nline2\ttabbed\""" + """u0001","score":null}}""")
      val r2 = get(port, "/point?key=2")
      assert(r2.body() == """{"row":{"key":2,"name":"inf","score":null}}""")
    } finally srv.stop()
  }
}
