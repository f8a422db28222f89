package graft

import org.apache.spark.sql.functions._

import graft.ingest.Codecs
import graft.state.KeyedStore

/** The composite serving topology end-to-end over the executable frame
  * edge: checkpointed source → JSON decode → stateful delta tracker →
  * alert fanout against KeyedStore-backed user prefs → executor-side
  * sends. Killed and resumed mid-stream: post-restart batches see the
  * tracker's recovered state AND a prefs upsert made while the stream
  * was down, with no duplicated and no lost alerts. */
class CompositeResumeSpec extends SparkSpec {

  test("kill + resume the composite topology: no duplicate or lost alerts") {
    import spark.implicits._
    implicit val s = spark
    val base = java.nio.file.Files.createTempDirectory("composite_").toString
    val (inDir, ckpt, prefsStore) = (s"$base/in", s"$base/ckpt", s"$base/prefs")
    new java.io.File(inDir).mkdirs()

    def writeFrames(file: String, rows: Seq[(String, String, String)]): Unit = {
      val w = new java.io.PrintWriter(s"$inDir/$file")
      rows.foreach { case (k, v, ts) =>
        w.println(s"""{"key":"$k","value":${
          com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
            .writeValueAsString(v)},"timestamp":"$ts"}""")
      }
      w.close()
    }
    def snapJson(confirmed: String, t: String) =
      s"""{"active":"0","confirmed":"$confirmed","deaths":"0","recovered":"0","state":"Assam","statecode":"AS","lastupdatedtime":"$t"}"""

    // durable prefs: one subscriber before the stream ever starts
    KeyedStore.upsert(
      Seq(graft.core.UserPrefs("u1", Seq("Assam"), subscribed = true)).toDF(),
      Seq("userId"), prefsStore)

    def start() = {
      val stamped = Codecs.fromFrameFiles(spark, inDir)
        .select(col("timestamp").as("eventTime"),
          from_json(col("value"), Codecs.statewiseStatsSchema).as("stats"))
        .as[graft.core.StampedStats]
      val deltas = graft.streaming.DeltaTracker.statewise(stamped).toDF()
        .select(col("eventTime"), col("delta.*"))
      graft.serve.AlertPipeline.runWithStore(
        deltas, prefsStore, SendProbe.send, Some(ckpt))
    }

    SendProbe.clear()
    // phase 1: first snapshot (full count alerts as the first delta)
    writeFrames("b0.json",
      Seq(("Assam", snapJson("10", "08/04/2020 00:00:00"),
        "2020-04-08T00:00:00.000Z")))
    val q1 = start()
    try {
      q1.processAllAvailable()
    } finally q1.stop() // the "kill": topology fully down
    assert(SendProbe.all == Seq(("u1", "10 new cases in Assam\n")),
      s"phase 1 sends: ${SendProbe.all}")

    // while down: a second subscriber arrives in the durable store and
    // a new snapshot lands on the topic
    KeyedStore.upsert(
      Seq(graft.core.UserPrefs("u2", Seq("Assam"), subscribed = true)).toDF(),
      Seq("userId"), prefsStore)
    writeFrames("b1.json",
      Seq(("Assam", snapJson("17", "08/04/2020 06:00:00"),
        "2020-04-08T06:00:00.000Z")))

    // phase 2: resume from the same checkpoint
    val q2 = start()
    try {
      q2.processAllAvailable()
    } finally q2.stop()

    val all = SendProbe.all
    // no duplicates: batch 0's alert is NOT re-sent (offsets resumed);
    // no losses: both subscribers get the new alert, and its delta is 7
    // (17 - 10) — the tracker's state recovered, not re-initialized
    assert(all.count(_ == (("u1", "10 new cases in Assam\n"))) == 1,
      s"batch-0 alert duplicated: $all")
    val phase2 = all.drop(1).toSet
    assert(phase2 == Set(
      ("u1", "7 new cases in Assam\n"),
      ("u2", "7 new cases in Assam\n")), s"phase 2 sends: $all")
    assert(all.size == 3)
  }
}
