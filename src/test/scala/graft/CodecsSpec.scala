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

  test("user-prefs codec handles the array field") {
    import spark.implicits._
    implicit val s = spark
    val in = Seq(UserPrefs("u1", Seq("Assam", "Delhi"), subscribed = true)).toDS()
    val back = Codecs.decode[UserPrefs](Codecs.encode(in, "userId"),
      Codecs.userPrefsSchema).collect().head
    assert(back == in.collect().head)
  }
}
