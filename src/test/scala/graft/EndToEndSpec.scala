package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.core._
import graft.ingest.Codecs
import graft.render.AlertFormat
import graft.state.MaterializedViews
import graft.streaming.{DailyAgg, DeltaTracker}

/** Capstone: the complete reference pipeline in one flow — wire-format
  * JSON frames → codec → running-delta tracker → daily window aggregate
  * → doubling rate → materialized serving views → a /stats-style query →
  * byte-golden alert rendering. A reference user's whole workload, end
  * to end on this engine. */
class EndToEndSpec extends SparkSpec {

  private def frame(ts: String, json: String): (Timestamp, String) =
    (Timestamp.valueOf(ts), json)

  test("statewise-data JSON → deltas → daily → doubling rate → rendered alert") {
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sqlCtx = spark.sqlContext

    // 1. wire format: the FIXTURES.md §1 snapshots, as Kafka-style frames
    val frames = Seq(
      frame("2020-04-08 00:04:28",
        """{"active":"4729","confirmed":"5341","deaths":"157","recovered":"455",
          |"state":"Total","statecode":"TT","lastupdatedtime":"08/04/2020 00:04:28"}"""
          .stripMargin.replace("\n", "")),
      frame("2020-04-08 06:00:00",
        """{"active":"4745","confirmed":"5372","deaths":"160","recovered":"463",
          |"state":"Total","statecode":"TT","lastupdatedtime":"08/04/2020 06:00:00"}"""
          .stripMargin.replace("\n", ""))
    )

    // 2. codec: decode value-JSON into the typed record + event time
    val ms = MemoryStream[(Timestamp, String)]
    val decoded = ms.toDF().toDF("eventTime", "value")
      .select(col("eventTime"),
        from_json(col("value"), Codecs.statewiseStatsSchema).as("stats"))
      .as[StampedStats]

    // 3-4. topology: running deltas feeding the daily window aggregate —
    // ONE DAG (the reference relays via a changelog topic, ST7)
    val deltas = DeltaTracker.statewise(decoded)

    // 5. materialized serving views (the "KTable" layer)
    val q1 = MaterializedViews.serveAsView(
      deltas.toDF().select(col("eventTime"), col("delta.*")),
      Seq("state"), "eventTime", "e2e_delta")
    val q2 = deltas.toDF()
      .select(col("eventTime"), col("delta.*"))
      .writeStream.format("memory").queryName("e2e_delta_log")
      .outputMode("append").start()
    try {
      ms.addData(frames.head)
      q1.processAllAvailable(); q2.processAllAvailable()
      ms.addData(frames.last)
      q1.processAllAvailable(); q2.processAllAvailable()

      // 6. serving query over the views: daily agg + doubling rate (batch
      // over the append log — same operators as the streaming form)
      val log = spark.table("e2e_delta_log")
      val daily = DailyAgg.statewiseDaily(
        log.select(col("eventTime"),
          struct(log.columns.filter(_ != "eventTime").map(col): _*).as("delta"))
          .as[StampedDelta])
      val rates = DailyAgg.doublingRates(daily)

      val latest = spark.table("global_temp.e2e_delta").collect().head
      val dailyRow = daily.collect().head
      val rateRow = rates.collect().head

      // latest-per-key view holds the second snapshot's delta
      assert(latest.getAs[Long]("deltaConfirmed") == 31L)
      assert(latest.getAs[Long]("currentConfirmed") == 5372L)
      // daily window sums both deltas of the day
      assert(dailyRow.getAs[Long]("deltaConfirmed") == 5372L)
      assert(dailyRow.getAs[String]("date") == "08/04/2020")
      // doubling rate: growth = 100*5372/5372 = 100% → 70/100 → "1"
      assert(rateRow.getAs[String]("doublingRate") == "1")

      // 7. render the alert exactly as the reference bot would
      val delta = StatewiseDelta(
        latest.getAs[Long]("deltaRecovered"), latest.getAs[Long]("deltaDeaths"),
        latest.getAs[Long]("deltaConfirmed"), latest.getAs[Long]("currentRecovered"),
        latest.getAs[Long]("currentDeaths"), latest.getAs[Long]("currentConfirmed"),
        latest.getAs[String]("lastUpdatedTime"), "Assam") // non-Total to render
      val dailyDelta = StatewiseDelta(
        dailyRow.getAs[Long]("deltaRecovered"), dailyRow.getAs[Long]("deltaDeaths"),
        dailyRow.getAs[Long]("deltaConfirmed"), 0, 0, 0, "", "Assam")
      val alert = AlertFormat.statewiseAlertText(
        AlertFormat.friendlyTime(delta.lastUpdatedTime),
        Seq(delta), Seq(dailyDelta), Map.empty,
        Map("Assam" -> rateRow.getAs[String]("doublingRate")), Seq.empty)
      assert(alert.startsWith("<i>April 08, 06:00 AM</i>\n\n"))
      assert(alert.contains("31 new cases, 3 deaths, 8 recoveries in Assam\n"))
      assert(alert.contains("Doubling rate: 1 days\n"))

      // 8. visualizer egress: the same daily frame → keyed chart-request
      // frame, ready for the batch Kafka producer (Visualizer.java:141)
      val chartFrame = graft.serve.ChartPipeline.singleSeries(
        daily.select(
          to_date(col("date"), "dd/MM/yyyy").as("day"),
          date_format(to_date(col("date"), "dd/MM/yyyy"), "MMM dd").as("label"),
          col("deltaConfirmed").as("value")),
        "last7daysoverview", "Confirmed").collect().head
      assert(chartFrame.getString(0) == "last7daysoverview")
      val chartJson = chartFrame.getString(1)
      assert(chartJson.contains(""""labels":["Apr 08"]"""), chartJson.take(300))
      assert(chartJson.contains(""""label":"Confirmed","data":[5372.0]"""))
      assert(chartJson.startsWith("""{"backgroundColor":"transparent""""))
    } finally { q1.stop(); q2.stop() }
  }

  test("durable serving: JSON frames → deltas → KeyedStore, queryable after restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.state.{KeyedStore, ViewCatalog}
    val base = java.nio.file.Files.createTempDirectory("e2e-kstore")
      .toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("e2e-ckpt")
      .toFile.getAbsolutePath

    val ms = MemoryStream[(Timestamp, String)]
    val decoded = ms.toDF().toDF("eventTime", "value")
      .select(col("eventTime"),
        from_json(col("value"), Codecs.statewiseStatsSchema).as("stats"))
      .as[StampedStats]
    val deltas = DeltaTracker.statewise(decoded).toDF()
      .select(col("eventTime"), col("delta.*"))
    def start() = ViewCatalog.serveDurable(ViewCatalog.statewiseDeltaStats,
      deltas, base, Some(ckpt))

    val q1 = start()
    try {
      ms.addData(frame("2020-04-08 00:04:28",
        """{"active":"4729","confirmed":"5341","deaths":"157","recovered":"455","state":"Total","statecode":"TT","lastupdatedtime":"08/04/2020 00:04:28"}"""))
      q1.processAllAvailable()
      ms.addData(frame("2020-04-08 06:00:00",
        """{"active":"4745","confirmed":"5372","deaths":"160","recovered":"463","state":"Total","statecode":"TT","lastupdatedtime":"08/04/2020 06:00:00"}"""))
      q1.processAllAvailable()
      // interactive query through the catalog view name (lazy alias)
      val row = spark.table("global_temp.statewise_delta_stats").collect().head
      assert(row.getAs[Long]("deltaConfirmed") == 31L)
      assert(row.getAs[Long]("currentConfirmed") == 5372L)
    } finally q1.stop()

    // serving state survives with the stream down: fresh session, no view
    val fresh = spark.newSession()
    val persisted = KeyedStore.read(fresh, base).collect().head
    assert(persisted.getAs[Long]("deltaConfirmed") == 31L)

    // resume from checkpoint: the tracker's RocksDB state restores, so
    // the NEXT snapshot's delta is relative to the pre-restart total
    val q2 = start()
    try {
      ms.addData(frame("2020-04-08 12:00:00",
        """{"active":"4800","confirmed":"5400","deaths":"162","recovered":"470","state":"Total","statecode":"TT","lastupdatedtime":"08/04/2020 12:00:00"}"""))
      q2.processAllAvailable()
      val row = spark.table("global_temp.statewise_delta_stats").collect().head
      assert(row.getAs[Long]("deltaConfirmed") == 28L, // 5400 - 5372
        s"delta after restart: ${row.getAs[Long]("deltaConfirmed")}")
      assert(row.getAs[Long]("currentConfirmed") == 5400L)
    } finally q2.stop()
  }

  test("the full 11-view catalog serves durably and recovers after restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.state.{KeyedStore, ViewCatalog}
    val root = java.nio.file.Files.createTempDirectory("vc-catalog")
      .toFile.getAbsolutePath
    val t1 = Timestamp.valueOf("2020-04-08 06:00:00")
    val t2 = Timestamp.valueOf("2020-04-08 12:00:00")

    // one generic keyed stream per view: (k1, k2, eventTime, v)
    // projected onto the spec's key columns
    val streams = graft.state.ViewCatalog.all.map { spec =>
      val ms = MemoryStream[(String, String, Timestamp, String)]
      val df0 = ms.toDS().toDF("k1", "k2", "eventTime", "v")
      val df = spec.keyCols match {
        case Seq(a) => df0.select(col("k1").as(a), col("eventTime"), col("v"))
        case Seq(a, b) =>
          df0.select(col("k1").as(a), col("k2").as(b), col("eventTime"), col("v"))
      }
      spec -> (ms, df)
    }
    def startAll() = streams.map { case (spec, (_, df)) =>
      ViewCatalog.serve(spec, df, root, checkpointed = true)
    }

    // round 1: every view gets one row, all queries stop (a "restart")
    val qs1 = startAll()
    try {
      streams.foreach { case (_, (ms, _)) => ms.addData(("key1", "sub1", t1, "v1")) }
      qs1.foreach(_.processAllAvailable())
      ViewCatalog.all.foreach { spec =>
        val rows = spark.table(s"global_temp.${spec.view}").collect()
        assert(rows.length == 1 && rows.head.getAs[String]("v") == "v1",
          s"${spec.view}: ${rows.toSeq}")
      }
    } finally qs1.foreach(_.stop())

    // with every stream down, the whole catalog is recoverable from the
    // stores alone — a fresh session reads each one cold
    val fresh = spark.newSession()
    ViewCatalog.all.foreach { spec =>
      assert(KeyedStore.isInitialized(fresh, s"$root/${spec.view}"),
        s"${spec.view} store missing")
      val rows = KeyedStore.read(fresh, s"$root/${spec.view}").collect()
      assert(rows.length == 1 && rows.head.getAs[String]("v") == "v1",
        s"${spec.view} after restart: ${rows.toSeq}")
    }

    // round 2: resumed queries upsert on top of recovered state — the
    // same key advances, no duplicates, every view stays 1 row
    val qs2 = startAll()
    try {
      streams.foreach { case (_, (ms, _)) => ms.addData(("key1", "sub1", t2, "v2")) }
      qs2.foreach(_.processAllAvailable())
      ViewCatalog.all.foreach { spec =>
        val rows = spark.table(s"global_temp.${spec.view}").collect()
        assert(rows.length == 1 && rows.head.getAs[String]("v") == "v2",
          s"${spec.view} after resume: ${rows.toSeq}")
      }
    } finally qs2.foreach(_.stop())
  }

  test("catalog view feeds the today bar chart (state-store → visualizer flow)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.state.ViewCatalog

    // deltas stream into the daily-states-count store analog, keyed
    // (date, state) like the reference's StateAndDate serde
    val ms = MemoryStream[StampedDelta]
    val keyed = ms.toDS().toDF()
      .select(col("eventTime"),
        date_format(col("eventTime"), "dd/MM/yyyy").as("date"),
        col("delta.state").as("state"),
        col("delta.deltaConfirmed"), col("delta.deltaRecovered"),
        col("delta.deltaDeaths"))
    val root = java.nio.file.Files.createTempDirectory("e2e-vc-root")
      .toFile.getAbsolutePath
    val q = ViewCatalog.serve(ViewCatalog.dailyStatesCount, keyed, root)
    def d(ts: String, state: String, dc: Long, dr: Long, dd: Long) =
      StampedDelta(Timestamp.valueOf(ts),
        StatewiseDelta(dr, dd, dc, 0, 0, 0, "", state))
    try {
      ms.addData(
        d("2020-04-08 06:00:00", "Assam", 10L, 2L, 1L),
        d("2020-04-08 07:00:00", "Delhi", 50L, 5L, 2L),
        d("2020-04-07 07:00:00", "Assam", 99L, 0L, 0L)) // yesterday: other key
      q.processAllAvailable()
      // upsert: Assam's today count refreshes in place
      ms.addData(d("2020-04-08 09:00:00", "Assam", 12L, 3L, 1L))
      q.processAllAvailable()

      // the visualizer's today() reads dailyCountFor(state, today) per
      // state; here it is one filter over the catalog view snapshot
      val today = spark.table("global_temp.daily_states_count")
        .filter(col("date") === "08/04/2020")
        .select("state", "deltaConfirmed", "deltaRecovered", "deltaDeaths")
      val chart = graft.serve.ChartPipeline
        .barChart(today, "today", "Apr 08").collect().head
      assert(chart.getString(0) == "today")
      val json = chart.getString(1)
      // Delhi (50) sorts before the refreshed Assam (12); yesterday's row
      // stays out of the chart
      assert(json.contains(""""labels":["Delhi","Assam"]"""), json.take(400))
      assert(json.contains(""""label":"Deaths","data":[2.0,1.0]"""))
      assert(!json.contains("99.0")) // yesterday's 99-count never charted
    } finally q.stop()
  }
}
