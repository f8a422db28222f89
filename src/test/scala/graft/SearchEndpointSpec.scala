package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.operators.TextIndex
import graft.serve.SearchEndpoint

/** Parameterized retrieval serving: real-socket round-trips against
  * the persisted text index — exact and fuzzy bodies equal the q179 /
  * q276 machinery's own answers, with the 400/404/405 request
  * discipline pinned. */
class SearchEndpointSpec extends SparkSpec {

  private lazy val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("search_idx")
      .toFile.getAbsolutePath + "/idx"
    TextIndex.ensure(
      graft.sources.Tables.load(spark, sf, "documents")
        .select("doc_id", "text"), r)
    r
  }

  test("GET /search body equals the index BM25 machinery's own answer") {
    val handle = SearchEndpoint.start(spark, root)
    try {
      val body = get(handle.port, "/search?q=spark%20join").body()
      val expected = SearchEndpoint.hits(spark, root,
        Seq("spark", "join"), fuzzy = false)
      assert(expected.nonEmpty)
      assert(body == expected.map { case (d, s, rn) =>
        s"""{"doc_id":$d,"score_u6":$s,"rn":$rn}"""
      }.mkString("[", ",", "]"), body.take(300))
    } finally handle.stop()
  }

  test("GET /search/fuzzy recovers misspelled terms; exact path misses them") {
    val handle = SearchEndpoint.start(spark, root)
    try {
      // 'spak' is in no document; the exact path returns nothing,
      // the fuzzy path expands it to 'spark' and ranks
      val exact = get(handle.port, "/search?q=spak")
      assert(exact.statusCode() == 200 && exact.body() == "[]", exact.body())
      val fuzzy = get(handle.port, "/search/fuzzy?q=spak")
      assert(fuzzy.statusCode() == 200 && fuzzy.body() != "[]")
      val viaOp = SearchEndpoint.hits(spark, root, Seq("spak"), fuzzy = true)
      assert(fuzzy.body() == viaOp.map { case (d, s, rn) =>
        s"""{"doc_id":$d,"score_u6":$s,"rn":$rn}"""
      }.mkString("[", ",", "]"))
    } finally handle.stop()
  }

  test("request discipline: 400 on missing q, exact-path 404s, 405 on POST") {
    val handle = SearchEndpoint.start(spark, root)
    try {
      assert(get(handle.port, "/search").statusCode() == 400)
      assert(get(handle.port, "/search?q=").statusCode() == 400)
      assert(get(handle.port, "/searchfoo?q=x").statusCode() == 404)
      assert(get(handle.port, "/search/fuzzy/extra?q=x").statusCode() == 404)
      assert(get(handle.port, "/nope").statusCode() == 404)
      val post = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${handle.port}/search?q=x"))
          .POST(HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(post.statusCode() == 405)
    } finally handle.stop()
  }
}
