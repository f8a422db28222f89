package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.serve.{LiveEndpoint, LiveServing}
import graft.state.MaterializedViews

/** The reference's DISTRICT face live — the r11 verdict's missing #3:
  * the bot's composite-key point query (StateStoresManager.java:125-127
  * keyed district stores, DistrictAlertConsumer.java:96-101 probing
  * (state, district)) served over a RUNNING stream. Ingest
  * (MemoryStream) → composite-key 1-day tumbling counts (update mode)
  * → continuously-maintained view → `GET /district/<k1>/<k2>` whose
  * body CHANGES between micro-batches.
  *
  * Batch parity is pinned against the ORACLED q08: the serving
  * reduction ([[LiveServing.districtRows]]) over q08's own daily
  * frame must equal q08's rows reduced to their latest day per key —
  * one machinery, no second implementation to drift. */
class LiveDistrictSpec extends SparkSpec {

  private val view = "live_district_spec"
  private lazy val client = HttpClient.newHttpClient()

  private def get(handle: LiveEndpoint.Handle, path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${handle.port}$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("composite-key HTTP body over a RUNNING stream reflects the latest micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, Long, String)]
    val q = MaterializedViews.serveDailyCountsAsView(
      ms.toDF().toDF("ts", "user_id", "event_type"),
      Seq("user_id", "event_type"), "ts", view)
    val handle = LiveEndpoint.startDistrict(spark, view)
    try {
      // before the first micro-batch there is no view: retryable 503
      assert(get(handle, "/district/1/a").statusCode() == 503)

      // batch 1: (1,a)×2 and (1,b)×1 on day 1, (2,a)×1 on day 1
      val d1 = Timestamp.valueOf("2024-03-01 10:00:00")
      ms.addData((d1, 1L, "a"), (d1, 1L, "a"), (d1, 1L, "b"), (d1, 2L, "a"))
      q.processAllAvailable()
      val r1 = get(handle, "/district/1/a")
      assert(r1.statusCode() == 200)
      assert(r1.body() ==
        """{"user_id":1,"event_type":"a","day":"2024-03-01","n":2,""" +
          """"total_n":2}""",
        r1.body())

      // batch 2: (1,a)×3 on day 2 → the SAME route's body CHANGES:
      // latest day advances, n is day-2's count, total_n accumulates
      val d2 = Timestamp.valueOf("2024-03-02 09:00:00")
      ms.addData((d2, 1L, "a"), (d2, 1L, "a"), (d2, 1L, "a"))
      q.processAllAvailable()
      val r2 = get(handle, "/district/1/a")
      assert(r2.statusCode() == 200)
      assert(r2.body() ==
        """{"user_id":1,"event_type":"a","day":"2024-03-02","n":3,""" +
          """"total_n":5}""",
        r2.body())
      assert(r1.body() != r2.body(), "body did not change across batches")

      // the key-1 listing: every district of the state, name-ascending
      // (the bot's per-state district summary); b saw no day-2 data
      // and still answers from day 1
      val rl = get(handle, "/district/1")
      assert(rl.statusCode() == 200)
      assert(rl.body() ==
        """[{"user_id":1,"event_type":"a","day":"2024-03-02","n":3,""" +
          """"total_n":5},""" +
          """{"user_id":1,"event_type":"b","day":"2024-03-01","n":1,""" +
          """"total_n":1}]""",
        rl.body())

      // point-query discipline: unknown keys and malformed paths 404,
      // non-GET 405 (the exact-path rules)
      assert(get(handle, "/district/9/a").statusCode() == 404)
      assert(get(handle, "/district/1/zz").statusCode() == 404)
      assert(get(handle, "/district/notanid/a").statusCode() == 404)
      assert(get(handle, "/district/1/a/extra").statusCode() == 404)
      assert(get(handle, "/district/").statusCode() == 404)
      assert(get(handle, "/nope").statusCode() == 404)
      val post = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${handle.port}/district/1/a"))
          .POST(HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(post.statusCode() == 405)
    } finally {
      handle.stop()
      q.stop()
      spark.catalog.dropGlobalTempView(view)
    }
  }

  test("district serving rows equal the ORACLED q08 reduced to its latest day per key") {
    // districtRows over the day-grain counts frame must equal q08's
    // output reduced to each key's latest day: q08 carries (n per day,
    // lifetime total_n) — exactly the serving row's two numbers
    val ev = graft.sources.Tables.load(spark, sf, "events")
    val daily = ev.groupBy(col("user_id"), col("event_type"),
        to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val served = LiveServing.districtRows(daily, Seq("user_id", "event_type"))
    val q08 = graft.queries.Registry.byName("q08_join_composite").fn(spark, sf)
    val expected = MaterializedViews.latestPerKey(
      q08, Seq("user_id", "event_type"), "day")
    val a = served.orderBy("user_id", "event_type")
      .collect().map(_.toString).toSeq
    val b = expected.orderBy("user_id", "event_type")
      .collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b)
  }
}
