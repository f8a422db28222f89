package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.QuotaLimiter
import graft.streaming.QuotaLimiter.{Admitted, QuotaEvent}

class QuotaLimiterSpec extends SparkSpec {

  private def ev(t: String, user: Long, id: Long) =
    QuotaEvent(Timestamp.valueOf(t), user, id)

  test("batch mode: admits first k per user-day in (time, id) order — q136 semantics") {
    import spark.implicits._
    val in = Seq(
      ev("2024-01-01 00:00:10", 1L, 5L), ev("2024-01-01 00:00:02", 1L, 9L),
      ev("2024-01-01 00:00:02", 1L, 4L), ev("2024-01-01 00:00:07", 1L, 1L),
      ev("2024-01-01 00:00:30", 1L, 2L), // 5th → dropped at k=3
      ev("2024-01-02 00:00:01", 1L, 3L), // next day: fresh quota
      ev("2024-01-01 00:00:05", 2L, 6L)
    ).toDS()
    val got = QuotaLimiter.admitFirstK(in, k = 3).collect().toSet
    assert(got === Set(
      Admitted(1L, "2024-01-01", 1L, 4L), // t=2 tie → lower id first
      Admitted(1L, "2024-01-01", 2L, 9L),
      Admitted(1L, "2024-01-01", 3L, 1L),
      Admitted(1L, "2024-01-02", 1L, 3L),
      Admitted(2L, "2024-01-01", 1L, 6L)))
  }

  test("streaming: quota persists across micro-batches; day evicts on watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[QuotaEvent]
    val q = QuotaLimiter.admitFirstK(ms.toDS(), k = 2, delay = "0 seconds")
      .writeStream.format("memory").queryName("quota_t")
      .outputMode("append").start()
    try {
      // batch 1: two admitted for user 1
      ms.addData(ev("2024-01-01 01:00:00", 1L, 10L),
        ev("2024-01-01 02:00:00", 1L, 11L))
      q.processAllAvailable()
      // batch 2: same day — quota remembered, third event suppressed
      ms.addData(ev("2024-01-01 03:00:00", 1L, 12L))
      q.processAllAvailable()
      val afterSameDay = spark.table("quota_t").as[Admitted].collect().toSet
      assert(afterSameDay === Set(
        Admitted(1L, "2024-01-01", 1L, 10L),
        Admitted(1L, "2024-01-01", 2L, 11L)))
      // batch 3: advance the watermark past day 1 (evicts its state),
      // then a fresh day admits again
      ms.addData(ev("2024-01-03 00:00:00", 1L, 13L))
      q.processAllAvailable()
      val finalRows = spark.table("quota_t").as[Admitted].collect().toSet
      assert(finalRows.contains(Admitted(1L, "2024-01-03", 1L, 13L)))
      assert(!finalRows.exists(_.eventId == 12L), "suppressed event leaked")
    } finally q.stop()
  }

  test("streaming equals batch when arrival respects event-time order") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      ev("2024-01-01 00:00:01", 1L, 1L), ev("2024-01-01 00:00:02", 1L, 2L),
      ev("2024-01-01 00:00:03", 1L, 3L), ev("2024-01-01 00:00:04", 1L, 4L),
      ev("2024-01-01 00:00:02", 2L, 5L), ev("2024-01-01 00:00:03", 2L, 6L))
    val batch = QuotaLimiter.admitFirstK(events.toDS(), k = 2).collect().toSet
    val ms = MemoryStream[QuotaEvent]
    val q = QuotaLimiter.admitFirstK(ms.toDS(), k = 2)
      .writeStream.format("memory").queryName("quota_d")
      .outputMode("append").start()
    try {
      // feed one event per micro-batch, in event-time order
      for (e <- events.sortBy(x => (x.eventTime.getTime, x.eventId))) {
        ms.addData(e); q.processAllAvailable()
      }
      val streamed = spark.table("quota_d")
        .as[Admitted].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("q136 batch query equals the limiter on the events table slice") {
    import spark.implicits._
    val ev = sources.Tables.load(spark, sf, "events")
      .select(col("ts").as("eventTime"), col("user_id").as("userId"),
        col("event_id").as("eventId"))
      .as[QuotaEvent]
    val viaLimiter = QuotaLimiter.admitFirstK(ev, k = 3)
      .select(col("userId").as("user_id"), col("day").cast("date").as("day"),
        col("rk"), col("eventId").as("event_id"))
      .collect().toSet
    val viaQuery = queries.Registry.byName("q136_event_quota")
      .fn(spark, sf).collect().toSet
    assert(viaLimiter.map(r => (r.getLong(0), r.getDate(1), r.getLong(2), r.getLong(3)))
      === viaQuery.map(r => (r.getLong(0), r.getDate(1), r.getLong(2), r.getLong(3))))
  }
}
