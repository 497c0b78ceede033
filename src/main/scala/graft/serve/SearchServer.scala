package graft.serve

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}

/** HTTP serving façade over the PERSISTED indexes — the retrieval twin
  * of [[FeatureServer]]'s feature-table contract: lexical search
  * against a [[graft.llm.TextIndex]] and vector search against a
  * [[graft.llm.IvfIndex]], both driver-routed partition-pruned probes
  * (a request reads the query terms' buckets / the query vector's
  * nearest cells, never the corpus).
  *
  * Routes:
  *   - `GET /search?terms=a,b,c[&k=10][&scorer=bm25|ql][&expand=N]` →
  *     200 `{"hits": [{"rank":…,"doc":…,"n_terms_hit":…,"score":…}, …]}`
  *     (400 on missing/empty terms or an unknown scorer; requires
  *     `textIndexDir`). `scorer=ql` ranks by the Dirichlet
  *     query-likelihood family over the same index; `expand=N` (bm25
  *     only) adds N pseudo-relevance-feedback terms mined from the
  *     top-3 hits before re-probing.
  *   - `GET /ann?vec=0.1,0.2,…[&k=5][&nProbe=4]` → 200
  *     `{"hits": [{"rank":…,"nid":…,"cosine":…}, …]}`
  *     (400 on a malformed vector; requires `ivfIndexDir`).
  *
  * Control-plane sized BY DESIGN (the [[FeatureServer]] contract): each
  * request is one pruned probe whose result is k rows through one
  * driver collect. Batch/data-plane consumers call
  * `TextIndex.probeAll` / `IvfIndex.probe` with a query FRAME directly
  * — this endpoint serves the interactive/debug contract.
  */
final class SearchServer(
    spark: SparkSession,
    textIndexDir: Option[String] = None,
    ivfIndexDir: Option[String] = None,
    port: Int = 0
) {
  require(textIndexDir.nonEmpty || ivfIndexDir.nonEmpty,
    "SearchServer needs at least one index to serve")

  import Wire.{jsonRow, jsonValue, queryParam, respond}

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Malformed numeric parameters are CLIENT errors: a non-numeric or
    * out-of-range k/expand/nProbe gets the same 400 the malformed-vec
    * and missing-terms paths return, never a 500 (ADVICE r8).
    */
  private def intParam(ex: HttpExchange, name: String, dflt: Int, min: Int): Either[String, Int] =
    queryParam(ex, name) match {
      case None => Right(dflt)
      case Some(raw) =>
        scala.util.Try(raw.trim.toInt).toOption.filter(_ >= min)
          .toRight(s"parameter $name must be an integer >= $min, got $raw")
    }

  server.createContext("/search", (ex: HttpExchange) =>
    try {
      (textIndexDir, queryParam(ex, "terms").map(_.split(",").map(_.trim).filter(_.nonEmpty))) match {
        case (None, _) => respond(ex, 400, """{"error":"no text index configured"}""")
        case (_, None) => respond(ex, 400, """{"error":"missing terms parameter"}""")
        case (_, Some(ts)) if ts.isEmpty =>
          respond(ex, 400, """{"error":"empty terms parameter"}""")
        case (Some(dir), Some(ts)) =>
          (for {
            k <- intParam(ex, "k", 10, min = 1)
            expand <- intParam(ex, "expand", 0, min = 0)
          } yield (k, expand)) match {
            case Left(msg) => respond(ex, 400, s"""{"error":${jsonValue(msg)}}""")
            case Right((k, expand)) =>
              queryParam(ex, "scorer").getOrElse("bm25") match {
                case "bm25" =>
                  val frame =
                    if (expand > 0)
                      graft.llm.TextIndex.probeExpanded(spark, dir, ts.toSeq, k,
                        fbDocs = 3, fbTerms = expand)
                    else graft.llm.TextIndex.probe(spark, dir, ts.toSeq, k)
                  respond(ex, 200,
                    frame.collect().map(jsonRow).mkString("""{"hits":[""", ",", "]}"))
                case "ql" =>
                  respond(ex, 200,
                    graft.llm.TextIndex.probeQl(spark, dir, ts.toSeq, k)
                      .collect().map(jsonRow).mkString("""{"hits":[""", ",", "]}"))
                case other =>
                  respond(ex, 400, s"""{"error":${jsonValue(s"unknown scorer $other")}}""")
              }
          }
      }
    } catch { case e: Exception => respond(ex, 500, s"""{"error":${jsonValue(e.toString)}}""") })

  private val qSchema = StructType(Seq(
    StructField("qid", LongType, nullable = false),
    StructField("qv", ArrayType(DoubleType, containsNull = false), nullable = false)))

  server.createContext("/ann", (ex: HttpExchange) =>
    try {
      (ivfIndexDir, queryParam(ex, "vec")) match {
        case (None, _) => respond(ex, 400, """{"error":"no vector index configured"}""")
        case (_, None) => respond(ex, 400, """{"error":"missing vec parameter"}""")
        case (Some(dir), Some(raw)) =>
          val vec =
            try raw.split(",").map(_.trim.toDouble)
            catch { case _: Exception => Array.empty[Double] }
          if (vec.isEmpty) respond(ex, 400, """{"error":"malformed vec parameter"}""")
          else (for {
            k <- intParam(ex, "k", 5, min = 1)
            nProbe <- intParam(ex, "nProbe", 4, min = 1)
          } yield (k, nProbe)) match {
            case Left(msg) => respond(ex, 400, s"""{"error":${jsonValue(msg)}}""")
            case Right((k, nProbe)) =>
              // one-row explicit-schema query frame (REPL-safe rule)
              val rows = java.util.Collections.singletonList(
                org.apache.spark.sql.Row(0L, vec.toSeq))
              val q = spark.createDataFrame(rows, qSchema)
              val hits = graft.llm.IvfIndex.probe(spark, dir, q, "qid", "qv", k, nProbe)
                .select("rank", "nid", "cosine")
                .collect().map(jsonRow)
              respond(ex, 200, hits.mkString("""{"hits":[""", ",", "]}"))
          }
      }
    } catch { case e: Exception => respond(ex, 500, s"""{"error":${jsonValue(e.toString)}}""") })

  def start(): Unit = server.start()
  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}
