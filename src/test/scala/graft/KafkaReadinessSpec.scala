package graft

import org.apache.spark.sql.streaming.Trigger

import graft.core.StatewiseDelta
import graft.ingest.Codecs

/** S2/S3 runtime readiness probe (r7 verdict item 8): the Kafka edge is
  * wiring-complete but the connector jar is absent from this
  * environment, and that gap must surface as an EXECUTED, visible
  * decision every run — never a silent skip that reads as coverage.
  *
  * Capability matrix, decided at runtime:
  *   - connector + `SPARK_GRAFT_KAFKA_BOOTSTRAP` (a reachable broker,
  *     embedded or external): the real edge executes — batch-produce
  *     encoded frames to a fresh topic, stream them back through the
  *     SAME decode path the file-backed edge runs, compare rows.
  *   - connector only: cancel() naming exactly what is missing and how
  *     to supply it (a ScalaTest cancel is counted and printed — loud).
  *   - no connector (this environment): cancel() pointing at the
  *     executed stand-in contract (CodecsSpec / CompositeResumeSpec on
  *     the file-backed frame edge), PLUS an executable assertion below
  *     that the absence is real, not assumed.
  */
class KafkaReadinessSpec extends SparkSpec {

  private def connectorPresent: Boolean =
    try {
      org.apache.spark.sql.execution.datasources.DataSource
        .lookupDataSource("kafka", spark.sessionState.conf)
      true
    } catch { case scala.util.control.NonFatal(_) => false }

  test("kafka edge executes against a provided broker; otherwise cancels naming the gap") {
    (connectorPresent, sys.env.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")) match {
      case (true, Some(servers)) =>
        implicit val s2: org.apache.spark.sql.SparkSession = spark
        import spark.implicits._
        val topic = s"graft-readiness-${java.util.UUID.randomUUID()}"
        val in = Seq(
          StatewiseDelta(deltaConfirmed = 10L, deltaRecovered = 1L,
            deltaDeaths = 2L, lastUpdatedTime = "08/04/2020 10:00:00",
            state = "KA"),
          StatewiseDelta(deltaConfirmed = 20L, deltaRecovered = 2L,
            deltaDeaths = 4L, lastUpdatedTime = "08/04/2020 10:00:00",
            state = "MH"))
        Codecs.toKafkaBatch(
          Codecs.encode(in.toDS(), "state"), servers, topic)
        val q = Codecs.fromKafka(spark, servers, topic)
          .selectExpr("CAST(key AS STRING) AS key",
            "CAST(value AS STRING) AS value")
          .writeStream.format("memory").queryName("kafka_readiness_rt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(60000L)
        val back = Codecs.decode[StatewiseDelta](
          spark.table("kafka_readiness_rt"), Codecs.statewiseDeltaSchema)
          .collect().toSet
        assert(back == in.toSet, s"kafka round-trip diverged: $back")
      case (true, None) =>
        System.err.println("[kafka-readiness] connector PRESENT but no " +
          "broker configured — set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port " +
          "to execute the live edge")
        cancel("kafka connector present, no broker: set " +
          "SPARK_GRAFT_KAFKA_BOOTSTRAP to run the live round-trip")
      case (false, _) =>
        System.err.println("[kafka-readiness] spark-sql-kafka connector " +
          "NOT on the classpath — S2/S3 execute via the file-backed " +
          "frame edge (CodecsSpec, CompositeResumeSpec)")
        cancel("no spark-sql-kafka connector in this environment; the " +
          "file-backed frame edge remains the executed S2/S3 contract")
    }
  }

  test("the absence the probe reports is real: format(\"kafka\") fails to resolve") {
    if (connectorPresent)
      cancel("connector IS present here — the resolution-failure " +
        "assertion only applies to connector-less environments")
    val e = intercept[Exception] {
      Codecs.fromKafka(spark, "localhost:9092", "probe-topic")
    }
    assert(e.getMessage != null &&
      (e.getMessage.toLowerCase.contains("kafka") ||
        e.getMessage.toLowerCase.contains("failed to find")),
      s"unexpected failure mode: ${e.getMessage}")
  }
}
