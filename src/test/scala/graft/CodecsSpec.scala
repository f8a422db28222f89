package graft

import org.apache.spark.sql.functions._

import graft.core.{StatewiseStats, UserPrefs}
import graft.ingest.Codecs

/** Codec fidelity on the reference's wire format (FIXTURES.md §1;
  * mirrors UserPrefsSerdeTest.java round-trip). */
class CodecsSpec extends SparkSpec {

  private val fixtureJson =
    """{"active":"4729","confirmed":"5341","deaths":"157","recovered":"455",
      |"state":"Total","statecode":"TT","lastupdatedtime":"08/04/2020 00:04:28"}"""
      .stripMargin.replace("\n", "")

  test("statewise-data frame decodes to the typed record (FIXTURES §1)") {
    import spark.implicits._
    implicit val s = spark
    val frames = Seq(("Total", fixtureJson)).toDF("key", "value")
    val got = Codecs.decode[StatewiseStats](frames, Codecs.statewiseStatsSchema)
      .collect().head
    assert(got == StatewiseStats("4729", "5341", "157", "455", "Total", "TT",
      "08/04/2020 00:04:28"))
  }

  test("S2/ST8 stream source wiring reaches kafka resolution with offset control") {
    val e = intercept[Exception] {
      Codecs.fromKafka(spark, "localhost:9092", "topic",
        startingOffsets = "latest").collect()
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  test("S3 streaming sink wiring reaches kafka resolution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val e = intercept[Exception] {
      Codecs.toKafka(ms.toDS().toDF("key", "value"),
        "localhost:9092", "topic", "/tmp/ckpt_s3_test").start()
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  test("S4 batch producer is wired through the kafka batch write path") {
    import spark.implicits._
    val frames = Codecs.encode(
      Seq(StatewiseStats("1", "2", "3", "4", "Assam", "AS", "t")).toDS(), "state")
    // the connector jar is absent in this environment: the write must
    // reach DataSource resolution of "kafka" (proving df.write.format
    // wiring), not fail earlier for any other reason
    val e = intercept[Exception] {
      Codecs.toKafkaBatch(frames, "localhost:9092", "t")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"), e.getMessage)
  }

  test("S2->A1->S3 executed round-trip: frame source -> delta topology -> checkpointed sink") {
    import spark.implicits._
    implicit val s = spark
    val base = java.nio.file.Files.createTempDirectory("kafka_rt_").toString
    val (inDir, outDir, ckpt) = (s"$base/in", s"$base/out", s"$base/ckpt")
    new java.io.File(inDir).mkdirs()

    // write frame files the way a topic would carry them
    def writeFrames(file: String, rows: Seq[(String, String, String)]): Unit = {
      val w = new java.io.PrintWriter(s"$inDir/$file")
      rows.foreach { case (k, v, ts) =>
        w.println(s"""{"key":"$k","value":${
          com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
            .writeValueAsString(v)},"timestamp":"$ts"}""")
      }
      w.close()
    }
    val snap1Json =
      """{"active":"4729","confirmed":"5341","deaths":"157","recovered":"455","state":"Total","statecode":"TT","lastupdatedtime":"08/04/2020 00:04:28"}"""
    val snap2Json =
      """{"active":"4745","confirmed":"5372","deaths":"160","recovered":"463","state":"Total","statecode":"TT","lastupdatedtime":"08/04/2020 06:00:00"}"""
    writeFrames("b0.json", Seq(
      ("Total", snap1Json, "2020-04-08T00:04:28.000Z"),
      ("Total", snap2Json, "2020-04-08T06:00:00.000Z")))

    def runOnce(): Unit = {
      val frames = Codecs.fromFrameFiles(spark, inDir)
      val stamped = frames
        .select(col("timestamp").as("eventTime"),
          from_json(col("value"), Codecs.statewiseStatsSchema).as("stats"))
        .as[graft.core.StampedStats]
      val deltas = graft.streaming.DeltaTracker.statewise(stamped)
      val q = Codecs.toFrameFiles(
          Codecs.encode(deltas.map(_.delta), "state"), outDir, ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    def readOut() = Codecs.decode[graft.core.StatewiseDelta](
      spark.read.schema("key string, value string").json(outDir)
        .select("key", "value"), Codecs.statewiseDeltaSchema).collect()
    val out1 = readOut().sortBy(_.lastUpdatedTime)
    assert(out1.length == 2)
    assert(out1(1).deltaConfirmed == 31L && out1(1).deltaRecovered == 8L &&
      out1(1).deltaDeaths == 3L && out1(1).currentConfirmed == 5372L)

    // append a third frame and re-run on the SAME checkpoint: only the
    // new offset is consumed (Kafka-style resume), output grows by one
    writeFrames("b1.json", Seq(("Total",
      """{"active":"4800","confirmed":"5400","deaths":"161","recovered":"470","state":"Total","statecode":"TT","lastupdatedtime":"08/04/2020 12:00:00"}""",
      "2020-04-08T12:00:00.000Z")))
    runOnce()
    val out2 = readOut().sortBy(_.lastUpdatedTime)
    assert(out2.length == 3, s"checkpoint resume reprocessed: ${out2.length}")
    assert(out2(2).deltaConfirmed == 28L) // 5400 - 5372
  }

  test("encode -> decode round trip preserves the record") {
    import spark.implicits._
    implicit val s = spark
    val in = Seq(StatewiseStats("1", "2", "3", "4", "Assam", "AS",
      "09/04/2020 10:00:00")).toDS()
    val frames = Codecs.encode(in, "state")
    assert(frames.columns.toSeq == Seq("key", "value"))
    val back = Codecs.decode[StatewiseStats](frames, Codecs.statewiseStatsSchema)
      .collect().head
    assert(back == in.collect().head)
  }

  test("malformed JSON decodes leniently to nulls (Gson parity)") {
    import spark.implicits._
    implicit val s = spark
    val frames = Seq(("k", "{not json")).toDF("key", "value")
    val got = Codecs.decode[StatewiseStats](frames, Codecs.statewiseStatsSchema)
      .toDF().collect().head
    assert((0 until got.length).forall(got.isNullAt))
  }

  test("bot produce paths: prefs/request/location frames keyed like the reference") {
    import spark.implicits._
    implicit val s = spark
    import graft.core.{UserLocation, UserRequest}
    import graft.serve.Producers
    val prefs = Producers.userPrefsFrames(
      Seq(UserPrefs("12345", Seq("Assam"), subscribed = true)).toDS())
      .collect().head
    assert(prefs.getString(0) == "12345")
    assert(prefs.getString(1).contains(""""myStates":["Assam"]"""))

    val req = Producers.userRequestFrames(
      Seq(UserRequest("777", "Today")).toDS()).collect().head
    assert(req.getString(0) == "777")
    assert(req.getString(1) == """{"chatId":"777","state":"Today"}""")

    val loc = Producers.userLocationFrames(spark,
      Seq(("777", UserLocation("26.14", "91.73")))).collect().head
    assert(loc.getString(0) == "777")
    // the key is not a value field in the reference record
    assert(loc.getString(1) == """{"latitude":"26.14","longitude":"91.73"}""")
  }

  test("user-prefs codec handles the array field") {
    import spark.implicits._
    implicit val s = spark
    val in = Seq(UserPrefs("u1", Seq("Assam", "Delhi"), subscribed = true)).toDS()
    val back = Codecs.decode[UserPrefs](Codecs.encode(in, "userId"),
      Codecs.userPrefsSchema).collect().head
    assert(back == in.collect().head)
  }
}
