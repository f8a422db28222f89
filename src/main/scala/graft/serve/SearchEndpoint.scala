package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextIndex

/** PARAMETERIZED retrieval serving over the persisted text index —
  * the search face the fixed-route layers ([[HttpEndpoint]]'s charts,
  * [[LiveEndpoint]]'s state/sketch views) don't cover: the query
  * arrives IN the request. Two routes on the JDK http server:
  *
  *  - `GET /search?q=<terms>`       — exact-term BM25 top-10
  *    ([[TextIndex.bm25Micros]] + the bounded-heap top-k);
  *  - `GET /search/fuzzy?q=<terms>` — the q276 "did you mean" path
  *    ([[TextIndex.fuzzyBm25]], Levenshtein-1 dictionary expansion).
  *
  * Bodies are JSON arrays of {doc_id, score_u6, rn} — the SAME exact
  * integer micros the oracled q179/q276 emit, so the spec pins the
  * HTTP body against the registered query machinery directly. Request
  * discipline: 400 on a missing/empty `q`, exact-path 404 elsewhere
  * (the r10 advice's prefix-matching lesson), terms split on
  * whitespace after standard URL decoding.
  *
  * Scale posture: each GET is one Spark job whose plan partition-
  * prunes to the query terms' buckets (exact path) or joins the
  * vocabulary-grain dictionary (fuzzy path); the server collects only
  * the ≤ 10-row answer. The index builds once ([[TextIndex.ensure]])
  * before serving — probe-only requests, the build-once/probe-many
  * contract. */
object SearchEndpoint {

  final class Handle private[SearchEndpoint] (server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private def parseQ(ex: HttpExchange): Option[Seq[String]] = {
    val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    raw.split("&").collectFirst {
      case p if p.startsWith("q=") =>
        java.net.URLDecoder
          .decode(p.stripPrefix("q="), StandardCharsets.UTF_8)
          .split("\\s+").filter(_.nonEmpty).toSeq
    }.filter(_.nonEmpty)
  }

  private[graft] def hits(spark: SparkSession, root: String,
      terms: Seq[String], fuzzy: Boolean): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val q = terms.map(t => (1L, t)).toDF("query_id", "term")
    val ranked =
      if (fuzzy) TextIndex.fuzzyBm25(spark, root, q, maxDist = 1, k = 10)
      else {
        val scored = TextIndex.bm25Micros(spark, root, q)
        graft.operators.Sampling.quotaPerGroup(scored, Seq("query_id"),
          col("score_u6").cast("double"), col("doc_id"), 10)
          .select(col("query_id"), col("id").as("doc_id"),
            col("score").cast("long").as("score_u6"), col("rn"))
      }
    ranked.orderBy(col("rn"))
      .select(col("doc_id"), col("score_u6"), col("rn").cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def json(rows: Seq[(Long, Long, Long)]): String =
    rows.map { case (d, s, rn) =>
      s"""{"doc_id":$d,"score_u6":$s,"rn":$rn}"""
    }.mkString("[", ",", "]")

  /** Serve the index at `root` on `port` (0 = ephemeral). The index
    * must already be built — probe-only serving fails fast otherwise
    * (the [[TextIndex]] readiness contract). */
  def start(spark: SparkSession, root: String, port: Int = 0): Handle = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type",
        if (code == 200) "application/json" else "text/plain")
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    }
    def route(path: String, fuzzy: Boolean): HttpHandler = new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        try {
          if (ex.getRequestMethod != "GET") respond(ex, 405, "GET only")
          else if (ex.getRequestURI.getPath != path) respond(ex, 404, "not found")
          else parseQ(ex) match {
            case None => respond(ex, 400, "missing or empty q parameter")
            case Some(terms) =>
              respond(ex, 200, json(hits(spark, root, terms, fuzzy)))
          }
        } catch {
          case e: Throwable => respond(ex, 500, String.valueOf(e.getMessage))
        }
    }
    // longest-prefix context matching: register the NESTED route first
    server.createContext("/search/fuzzy", route("/search/fuzzy", fuzzy = true))
    server.createContext("/search", route("/search", fuzzy = false))
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit =
        respond(ex, 404, "not found")
    })
    server.start()
    new Handle(server)
  }
}
