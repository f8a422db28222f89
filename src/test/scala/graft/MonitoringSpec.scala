package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Monitoring

/** The continuous-monitoring composition the reference runs as
  * cron-over-KTable (Visualizer's scheduled extracts over materialized
  * state): a watermarked streaming daily count materializes finalized
  * (day, type) windows into a view as each day CLOSES, and the q131
  * anomaly test is a standing batch query over that view — same
  * decision logic, no separate streaming implementation to drift. */
class MonitoringSpec extends SparkSpec {

  private def ev(t: String, typ: String) = (Timestamp.valueOf(t), typ)

  test("rateAnomalies: flags the spike day once; warm-up days never flag") {
    import spark.implicits._
    val rows =
      (1 to 11).flatMap { d =>
        val n = if (d == 11) 100 else 10
        Seq.fill(n)((java.sql.Date.valueOf(f"2024-01-$d%02d"), "click"))
      }
    val daily = rows.toDF("day", "event_type")
      .groupBy("day", "event_type").agg(count(lit(1)).as("n"))
    val flagged = Monitoring.rateAnomalies(daily)
      .select("day").as[java.sql.Date].collect().toSet
    assert(flagged === Set(java.sql.Date.valueOf("2024-01-11")))
    // a flat series (drop the spike) flags nothing
    val flat = rows.filter(_._1.toString != "2024-01-11")
      .toDF("day", "event_type")
      .groupBy("day", "event_type").agg(count(lit(1)).as("n"))
    assert(Monitoring.rateAnomalies(flat).isEmpty)
  }

  test("rateAnomalies: a COLLAPSE (drop to near-zero) flags with negative dev7") {
    import spark.implicits._
    val rows = (1 to 11).flatMap { d =>
      val n = if (d == 11) 1 else 50
      Seq.fill(n)((java.sql.Date.valueOf(f"2024-03-$d%02d"), "ingest"))
    }
    val daily = rows.toDF("day", "event_type")
      .groupBy("day", "event_type").agg(count(lit(1)).as("n"))
    val got = Monitoring.rateAnomalies(daily).collect()
    assert(got.length === 1)
    assert(got(0).getAs[java.sql.Date]("day").toString === "2024-03-11")
    assert(got(0).getAs[Long]("dev7") < 0, "collapse must flag negative")
  }

  test("streaming daily view + standing anomaly query: spike flags only after its day closes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    // watermarked tumbling-day count in APPEND mode: a (day, type) row
    // reaches the sink only when the watermark proves the day closed —
    // the streaming form of the daily rollup q131 runs over
    val daily = ms.toDF().toDF("ts", "event_type")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(to_date(col("w.start")).as("day"), col("event_type"), col("n"))
    val q = daily.writeStream.format("memory").queryName("daily_mon")
      .outputMode("append").start()
    try {
      // days 1..10 flat (10 events each), day 11 spikes to 60
      for (d <- 1 to 10)
        ms.addData((1 to 10).map(i => ev(f"2024-02-$d%02d 00:00:$i%02d", "click")): _*)
      ms.addData((1 to 60).map(i => ev(f"2024-02-11 00:0${i / 60}:${i % 60}%02d", "click")): _*)
      q.processAllAvailable()
      // the spike day is NOT closed yet (watermark sits inside day 11):
      // the standing query over the view must not flag it
      val before = Monitoring.rateAnomalies(spark.table("daily_mon"))
      assert(before.isEmpty, "flagged an unfinished day")
      // one event on day 12 pushes the watermark past day 11's end
      ms.addData(ev("2024-02-12 00:00:01", "click"))
      q.processAllAvailable()
      val after = Monitoring.rateAnomalies(spark.table("daily_mon"))
        .select("day").as[java.sql.Date].collect().toSet
      assert(after === Set(java.sql.Date.valueOf("2024-02-11")))
    } finally q.stop()
  }
}
